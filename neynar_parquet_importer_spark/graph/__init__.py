from .counts import (
    empty_counts,
    fold_counts_batch,
    follow_counts_delta,
    follow_counts_full,
    merge_counts,
    read_counts,
)
from .schema import apply_graph_schema, graph_schema_statements
from .transforms import (
    follows_to_edges,
    users_to_nodes,
    verifications_to_nodes_and_edges,
    edges_to_node_keys,
    profiles_with_verifications,
)

__all__ = [
    "empty_counts",
    "fold_counts_batch",
    "follow_counts_delta",
    "follow_counts_full",
    "merge_counts",
    "read_counts",
    "apply_graph_schema",
    "graph_schema_statements",
    "follows_to_edges",
    "users_to_nodes",
    "verifications_to_nodes_and_edges",
    "edges_to_node_keys",
    "profiles_with_verifications",
]
