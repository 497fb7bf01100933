from .transforms import (
    follows_to_edges,
    users_to_nodes,
    verifications_to_nodes_and_edges,
    edges_to_node_keys,
    profiles_with_verifications,
)

__all__ = [
    "follows_to_edges",
    "users_to_nodes",
    "verifications_to_nodes_and_edges",
    "edges_to_node_keys",
    "profiles_with_verifications",
]
