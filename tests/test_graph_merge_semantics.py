"""S10 MERGE semantics executed for real against networkx: a ~40-line
interpreter for the exact UNWIND-MERGE statement shapes the writer
emits (MERGE node by key + SET, MERGE both endpoints + MERGE edge +
SET) applies batches to a MultiDiGraph, validating what the Cypher
string tests alone cannot — idempotent re-import, last-batch-wins
property updates, and implicit endpoint creation (the reference's
neo4j_queries.py:8-98 semantics)."""

from __future__ import annotations

import re

import networkx as nx

from neynar_parquet_importer_spark.graph.writer import (
    edge_merge_cypher,
    node_merge_cypher,
)

_NODE = re.compile(
    r"UNWIND \$batch AS row MERGE \(n:(\w+) \{(\w+): row\.(\w+)\}\)(?: SET (.*))?$"
)
_EDGE = re.compile(
    r"UNWIND \$batch AS row "
    r"MERGE \(a:(\w+) \{(\w+): row\.src\}\) "
    r"MERGE \(b:(\w+) \{(\w+): row\.dst\}\) "
    r"MERGE \(a\)-\[r:(\w+)\]->\(b\)(?: SET (.*))?$"
)


def _parse_sets(sets: str | None, var: str) -> list[str]:
    if not sets:
        return []
    return [
        m.group(1)
        for m in re.finditer(rf"{var}\.(\w+) = row\.(\w+)", sets)
    ]


def apply_cypher(g: nx.MultiDiGraph, cypher: str, batch: list[dict]) -> None:
    """Execute the two UNWIND-MERGE statement shapes against networkx."""
    m = _NODE.match(cypher)
    if m:
        label, key, _, sets = m.groups()
        for row in batch:
            nid = (label, row[key])
            if nid not in g:
                g.add_node(nid, **{key: row[key]})
            for prop in _parse_sets(sets, "n"):
                g.nodes[nid][prop] = row[prop]
        return
    m = _EDGE.match(cypher)
    if m:
        sl, sk, dl, dk, rel, sets = m.groups()
        for row in batch:
            a, b = (sl, row["src"]), (dl, row["dst"])
            for nid, k, v in ((a, sk, row["src"]), (b, dk, row["dst"])):
                if nid not in g:
                    g.add_node(nid, **{k: v})
            if not any(
                d.get("_rel") == rel for d in g.get_edge_data(a, b, default={}).values()
            ):
                g.add_edge(a, b, _rel=rel)
            for kk, d in g.get_edge_data(a, b).items():
                if d.get("_rel") == rel:
                    for prop in _parse_sets(sets, "r"):
                        d[prop] = row[prop]
        return
    raise AssertionError(f"unrecognized cypher shape: {cypher}")


def _import(g, node_batches, edge_batches):
    node_cy = node_merge_cypher("User", "fid", ["fid", "name"])
    edge_cy = edge_merge_cypher("FOLLOWS", "User", "User", "fid", "fid", ["ts"])
    for b in node_batches:
        apply_cypher(g, node_cy, b)
    for b in edge_batches:
        apply_cypher(g, edge_cy, b)


NODES = [[{"fid": 1, "name": "a"}, {"fid": 2, "name": "b"}]]
EDGES = [[{"src": 1, "dst": 2, "ts": 10}, {"src": 1, "dst": 3, "ts": 11}]]


def test_merge_is_idempotent():
    g1, g2 = nx.MultiDiGraph(), nx.MultiDiGraph()
    _import(g1, NODES, EDGES)
    _import(g2, NODES, EDGES)
    _import(g2, NODES, EDGES)  # re-import: same graph
    assert nx.utils.graphs_equal(g1, g2)


def test_merge_creates_missing_endpoints():
    g = nx.MultiDiGraph()
    _import(g, NODES, EDGES)
    # fid=3 was never in a node batch; the edge MERGE created it (J2)
    assert ("User", 3) in g
    assert g.nodes[("User", 3)] == {"fid": 3}


def test_merge_set_updates_props_last_batch_wins():
    g = nx.MultiDiGraph()
    _import(g, NODES, EDGES)
    _import(g, [[{"fid": 1, "name": "renamed"}]], [[{"src": 1, "dst": 2, "ts": 99}]])
    assert g.nodes[("User", 1)]["name"] == "renamed"
    assert g.number_of_edges(("User", 1), ("User", 2)) == 1  # no duplicate edge
    [d] = g.get_edge_data(("User", 1), ("User", 2)).values()
    assert d["ts"] == 99


# ---------------------------------------------------------------------------
# Partition-body contracts (write_merge_partition drives the same loop
# foreachPartition runs; the Cypher executes against networkx)
# ---------------------------------------------------------------------------

def _no_sleep_retry(attempts):
    def retry(fn):
        for i in range(attempts):
            try:
                fn()
                return
            except Exception:
                if i == attempts - 1:
                    raise
    return retry


class _Driver:
    def close(self):
        pass


def test_merge_partition_connection_drop_reconnects_and_resumes():
    """A bolt session lost mid-partition: the failed chunk's retry must
    reopen a session and re-run it; prior chunks stay applied and the
    replayed chunk is idempotent (MERGE)."""
    from neynar_parquet_importer_spark.graph.writer import (
        write_merge_partition,
    )

    g = nx.MultiDiGraph()
    opens = {"n": 0}
    fail = {"armed": True}
    cypher = node_merge_cypher("User", "fid", ["fid", "name"])

    class _Sess:
        def run(self, cy, batch):
            if fail["armed"] and batch[0]["fid"] == 3:  # the second chunk
                fail["armed"] = False
                raise RuntimeError("bolt connection dropped")
            apply_cypher(g, cy, batch)

        def close(self):
            pass

    def open_session():
        opens["n"] += 1
        return _Driver(), _Sess()

    rows = [{"fid": i, "name": f"u{i}"} for i in range(1, 5)]
    write_merge_partition(
        rows, open_session, cypher, batch_size=2,
        to_dict=lambda r: r, retry=_no_sleep_retry(3),
    )
    assert opens["n"] == 2  # the retry opened a fresh session
    assert sorted(n[1] for n in g.nodes) == [1, 2, 3, 4]
    assert g.nodes[("User", 3)]["name"] == "u3"


def test_merge_partition_streams_lazily_and_connects_lazily():
    """Rows are pulled one UNWIND chunk at a time (bounded lookahead) and
    an empty partition opens no session at all."""
    from neynar_parquet_importer_spark.graph.writer import (
        write_merge_partition,
    )

    cypher = node_merge_cypher("User", "fid", ["fid"])
    yielded = {"n": 0}
    seen: list[tuple[int, int]] = []

    def rows():
        for i in range(7):
            yielded["n"] += 1
            yield {"fid": i}

    class _Sess:
        def run(self, cy, batch):
            seen.append((len(batch), yielded["n"]))

        def close(self):
            pass

    write_merge_partition(
        rows(), lambda: (_Driver(), _Sess()), cypher, batch_size=3,
        to_dict=lambda r: r, retry=_no_sleep_retry(1),
    )
    assert [n for n, _ in seen] == [3, 3, 1]
    done = 0
    for n_batch, yielded_at in seen:
        assert yielded_at <= done + 3  # one chunk of lookahead
        done += n_batch

    opens = {"n": 0}

    def open_session():
        opens["n"] += 1
        return _Driver(), _Sess()

    write_merge_partition(
        iter([]), open_session, cypher, batch_size=3,
        to_dict=lambda r: r, retry=_no_sleep_retry(1),
    )
    assert opens["n"] == 0


def test_write_edges_partition_via_interpreter():
    """The edge writer's partition body MERGEs implicit endpoints and
    relationship props through the same streaming loop."""
    from neynar_parquet_importer_spark.graph.writer import (
        edge_merge_cypher,
        write_merge_partition,
    )

    g = nx.MultiDiGraph()
    cypher = edge_merge_cypher("FOLLOWS", "User", "User", "fid", "fid", ["ts"])

    class _Sess:
        def run(self, cy, batch):
            apply_cypher(g, cy, batch)

        def close(self):
            pass

    rows = [{"src": 1, "dst": 2, "ts": 5}, {"src": 2, "dst": 3, "ts": 6}]
    write_merge_partition(
        rows, lambda: (_Driver(), _Sess()), cypher, batch_size=1,
        to_dict=lambda r: r, retry=_no_sleep_retry(1),
    )
    assert sorted(n[1] for n in g.nodes) == [1, 2, 3]  # implicit endpoints
    assert g.number_of_edges(("User", 1), ("User", 2)) == 1


# ---------------------------------------------------------------------------
# Graph schema bootstrap gating (neo4j_schema.py:17-60 semantics)
# ---------------------------------------------------------------------------

def test_graph_schema_gating():
    from neynar_parquet_importer_spark.graph.schema import graph_schema_statements

    # tracking constraint is unconditional
    base = graph_schema_statements([])
    assert len(base) == 1 and "ImportTracking" in base[0]

    # follows alone: tracking + relationship indexes, no node schemas.
    # Both relationship families appear — the reference's
    # _create_relationship_indexes emits FOLLOWS and VERIFIED_ADDRESS
    # together whenever any relationship table is selected
    s = "\n".join(graph_schema_statements(["follows"]))
    assert "FOLLOWS" in s and "VERIFIED_ADDRESS" in s
    assert "user_id_unique" not in s and "address_id_unique" not in s

    # verifications triggers BOTH address schema and relationship indexes
    s = "\n".join(graph_schema_statements(["nindexer_verifications"]))
    assert "address_id_unique" in s and "VERIFIED_ADDRESS" in s

    # full selection emits every group exactly once, all idempotent
    all_s = graph_schema_statements(["nindexer_profiles", "nindexer_follows",
                                     "nindexer_verifications"])
    assert len(all_s) == len(set(all_s)) == 11
    assert all("IF NOT EXISTS" in stmt for stmt in all_s)


def _graph_canon(g):
    return (
        sorted((n, tuple(sorted(d.items()))) for n, d in g.nodes(data=True)),
        sorted(
            (u, v, tuple(sorted(d.items()))) for u, v, d in g.edges(data=True)
        ),
    )


def test_edge_writer_mid_batch_drop_resumes_from_failed_chunk():
    """S9-parity for the EDGE path (test_live_sinks mirrors this for
    Postgres): a bolt session dying while executing the second edge
    chunk must reconnect, re-run only that chunk, and keep prior chunks
    applied — no lost or duplicated edges (MERGE replay is a no-op)."""
    from neynar_parquet_importer_spark.graph.writer import (
        write_merge_partition,
    )

    g = nx.MultiDiGraph()
    opens = {"n": 0}
    fail = {"armed": True}
    cypher = edge_merge_cypher("FOLLOWS", "User", "User", "fid", "fid", ["ts"])

    class _Sess:
        def run(self, cy, batch):
            if fail["armed"] and batch[0]["src"] == 3:  # second chunk
                fail["armed"] = False
                raise RuntimeError("bolt connection dropped")
            apply_cypher(g, cy, batch)

        def close(self):
            pass

    def open_session():
        opens["n"] += 1
        return _Driver(), _Sess()

    rows = [{"src": i, "dst": i + 100, "ts": i} for i in range(1, 5)]
    write_merge_partition(
        rows, open_session, cypher, batch_size=2,
        to_dict=lambda r: r, retry=_no_sleep_retry(3),
    )
    assert opens["n"] == 2
    assert sorted(s[1] for s, _ in g.edges()) == [1, 2, 3, 4]


def test_edge_writer_crash_replay_is_idempotent():
    """Spark task-retry semantics: a crash mid-partition (retries
    exhausted) leaves prior chunks applied AND the error propagated (so
    the task fails and the WHOLE partition re-runs); the replay over the
    partially-applied graph must converge to exactly the clean run's
    graph — MERGE + last-batch-wins SET make the re-run safe."""
    import pytest

    from neynar_parquet_importer_spark.graph.writer import (
        write_merge_partition,
    )

    cypher = edge_merge_cypher("FOLLOWS", "User", "User", "fid", "fid", ["ts"])
    rows = [{"src": i, "dst": i + 100, "ts": i * 10} for i in range(1, 5)]

    def run_partition(g, fail_chunk_src=None, attempts=1):
        state = {"armed": fail_chunk_src is not None}

        class _Sess:
            def run(self, cy, batch):
                if state["armed"] and batch[0]["src"] == fail_chunk_src:
                    raise RuntimeError("connection dropped, stays down")
                apply_cypher(g, cy, batch)

            def close(self):
                pass

        write_merge_partition(
            rows, lambda: (_Driver(), _Sess()), cypher, batch_size=2,
            to_dict=lambda r: r, retry=_no_sleep_retry(attempts),
        )

    clean = nx.MultiDiGraph()
    run_partition(clean)

    crashed = nx.MultiDiGraph()
    # connection stays down: retries exhaust and the error PROPAGATES
    # (a swallowed error would mark the task successful with lost rows)
    with pytest.raises(RuntimeError, match="stays down"):
        run_partition(crashed, fail_chunk_src=3)
    assert sorted(s[1] for s, _ in crashed.edges()) == [1, 2]  # partial

    run_partition(crashed)  # the task retry: full partition replay
    assert _graph_canon(crashed) == _graph_canon(clean)


def test_graph_schema_properties_match_emitted_transforms(spark):
    """Every constraint/index property must be one the transforms
    actually emit under that label/relationship — a constraint on a
    property that never exists silently never fires (MERGE races under
    concurrent writers) and its index never serves a lookup."""
    import re

    from neynar_parquet_importer_spark.graph import transforms as tr
    from neynar_parquet_importer_spark.graph.schema import (
        graph_schema_statements,
    )

    users = spark.createDataFrame(
        [(1, "u", None)], "fid long, username string, updated_at timestamp"
    )
    ver = spark.createDataFrame(
        [(1, bytearray(b"\x01"), "ethereum", None, None, None)],
        "fid long, address binary, protocol string, "
        "timestamp timestamp, updated_at timestamp, deleted_at timestamp",
    )
    node_props = {"User": set(tr.users_to_nodes(users).columns)}
    anodes, aedges = tr.verifications_to_nodes_and_edges(ver)
    node_props["Address"] = set(anodes.columns)
    rel_props = {"VERIFIED_ADDRESS": set(aedges.columns)}
    follows = spark.createDataFrame(
        [(1, 2, None, None, None, None)],
        "fid long, target_fid long, timestamp timestamp, "
        "created_at timestamp, updated_at timestamp, deleted_at timestamp",
    )
    rel_props["FOLLOWS"] = set(tr.follows_to_edges(follows).columns)

    pat = re.compile(
        r"FOR (?:\((\w+):(\w+)\)|\(\)-\[(\w+):(\w+)\]-\(\)) "
        r"(?:REQUIRE|ON) \(?([\w., ]+?)\)?(?: IS UNIQUE|$)"
    )
    for stmt in graph_schema_statements(
        ["nindexer_profiles", "nindexer_follows", "nindexer_verifications"]
    ):
        m = pat.search(stmt)
        assert m, stmt
        var, label, rvar, rtype, props = m.groups()
        if label == "ImportTracking":
            continue  # ledger twin, written by a separate path
        emitted = node_props[label] if label else rel_props[rtype]
        for p in props.split(","):
            name = p.strip().split(".", 1)[1]
            assert name in emitted, f"{stmt}: property {name!r} never emitted"
