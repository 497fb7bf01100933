"""Registry chunk split out of plans/queries.py (round-9 hygiene): original lines 5990-7203. Definitions land in the shared QUERIES/ORACLE_SQL dicts at import; the spine (plans.queries) imports every chunk in original order and re-exports all names, so `from ..plans.queries import X` keeps working for every X."""
from __future__ import annotations

from .q_embed_pipeline import (  # noqa: E501
    _BM25_QUERIES,
    _DIRTY_NAME_EXPR,
)
from .q_oracle_static import (  # noqa: E501
    ORACLE_SQL,
)
from .queries import (  # noqa: E501
    clu,
    hl,
    lay,
    rtr,
    sim,
)


def _lsh_topk_oracle_sql(sf_dir: str) -> str:
    """Generated oracle for embedding_lsh_topk: the hyperplanes are a pure
    seeded function (make_planes' LCG), so they embed as DOUBLE[] literals
    and DuckDB replays the exact bucketing — sign of the same left-to-right
    dot product — the multiprobe hamming filter, and the pruned top-k.
    The plane width is read from the corpus (the literal planes must
    match the dim the engine derives at runtime)."""
    dim = len(_oracle_embeddings(sf_dir, limit=1)[0])
    planes = sim.make_planes(dim, 8)
    values = ",\n            ".join(
        f"({i}, {planes[i]!r}::DOUBLE[])" for i in range(len(planes))
    )
    return f"""
        WITH planes(pid, plane) AS (VALUES
            {values}
        ), e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), b AS (
            SELECT e.vec_id,
                   CAST(sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
                                 THEN CAST(pow(2, p.pid) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS bucket
            FROM e CROSS JOIN planes p
            GROUP BY e.vec_id
        ), q AS (
            SELECT e.v AS qv, b.bucket AS qb
            FROM e JOIN b USING (vec_id) WHERE e.vec_id = 0
        )
        SELECT vec_id, round(cos_raw, 6) AS cos_sim
        FROM (
            SELECT c.vec_id,
                   CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS cos_raw
            FROM (
                SELECT e.vec_id,
                       list_dot_product(e.v, q.qv) AS num,
                       sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.qv, q.qv)) AS den
                FROM e JOIN b USING (vec_id) CROSS JOIN q
                WHERE bit_count(xor(b.bucket, q.qb)) <= 1
            ) c
        )
        ORDER BY cos_raw DESC, vec_id
        LIMIT 20
    """


def _oracle_embeddings(sf_dir: str, where: str = "", limit: int | None = None):
    """Fetch ``sf_dir``'s embedding vectors OUTSIDE Spark in the exact
    order the Spark trainers sample them (ORDER BY vec_id), for oracle
    generation — the trained-artifact twins must replay training on the
    same corpus the oracle SQL will be executed against."""
    import duckdb

    con = duckdb.connect()
    sql = (
        "SELECT embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') "
        f"{where} ORDER BY vec_id"
    )
    if limit is not None:
        sql += f" LIMIT {limit}"
    rows = con.execute(sql).fetchall()
    con.close()
    return [[float(x) for x in r[0]] for r in rows]


def _ivf_topk_oracle_sql(sf_dir: str) -> str:
    """Generated oracle for embedding_ivf_topk: the coarse quantizer is a
    deterministic function of the corpus sample (spherical_kmeans_core —
    the SAME numpy code path the Spark query trains with, so the centroid
    floats are bitwise identical) and embeds as DOUBLE[] literals; DuckDB
    then replays assignment (argmax dot, ties to the higher cid — the
    engine's array_max-over-structs rule), the nprobe=6 probe selection,
    and the pruned top-k."""
    cents = sim.spherical_kmeans_core(_oracle_embeddings(sf_dir, limit=2048), 16)
    values = ",\n            ".join(
        f"({i}, {cents[i]!r}::DOUBLE[])" for i in range(len(cents))
    )
    return f"""
        WITH cents(cid, c) AS (VALUES
            {values}
        ), e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), q AS (
            SELECT v AS qv FROM e WHERE vec_id = 0
        ), probe AS (
            SELECT cid FROM cents CROSS JOIN q
            ORDER BY list_dot_product(c, q.qv) DESC, cid DESC LIMIT 6
        ), assigned AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, cents.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_dot_product(e.v, cents.c) DESC,
                                    cents.cid DESC) AS rn
                FROM e CROSS JOIN cents
            ) WHERE rn = 1
        )
        SELECT vec_id, round(cos_raw, 6) AS cos_sim
        FROM (
            SELECT s.vec_id,
                   CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS cos_raw
            FROM (
                SELECT e.vec_id,
                       list_dot_product(e.v, q.qv) AS num,
                       sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.qv, q.qv)) AS den
                FROM e
                JOIN assigned USING (vec_id)
                CROSS JOIN q
                WHERE assigned.cid IN (SELECT cid FROM probe)
            ) s
        )
        ORDER BY cos_raw DESC, vec_id
        LIMIT 20
    """


def _pq_topk_oracle_sql(sf_dir: str) -> str:
    """Generated oracle for embedding_pq_topk: codebooks replay through
    pq_codebooks_core (bitwise-identical floats), the query's ADC
    distance TABLE is computed with the same Python arithmetic pq_topk
    uses and embedded as literals, per-row codes are recomputed in SQL
    (normalized subvector, L2-argmin with numpy's first-index tie rule
    -> ORDER BY dist, cid), and the row distance is the same left-
    associated chain of 8 table lookups."""
    books = sim.pq_codebooks_core(_oracle_embeddings(sf_dir, limit=2048), 8, 16)
    qvec = _oracle_embeddings(sf_dir, where="WHERE vec_id = 0")[0]
    n_sub, sub = len(books), len(books[0][0])
    # ONE shared arithmetic path with pq_topk: the embedded table floats
    # are the engine's exact values by construction
    dtable = sim.pq_adc_table(qvec, books)
    book_vals = ",\n            ".join(
        f"({s}, {c}, {books[s][c]!r}::DOUBLE[])"
        for s in range(n_sub)
        for c in range(len(books[s]))
    )
    dt_vals = ",\n            ".join(
        # ::DOUBLE so the 8-lookup addition chain is double-stepped like
        # the engine's (a bare literal types DECIMAL, whose sum is exact
        # decimal — not "the same left-associated chain" at all)
        f"({s}, {c}, {dtable[s][c]!r}::DOUBLE)"
        for s in range(n_sub)
        for c in range(len(dtable[s]))
    )
    dist_expr = " + ".join(
        f"(SELECT d FROM dt WHERE dt.s = {s} AND dt.cid = codes.c{s})"
        for s in range(n_sub)
    )
    code_cols = ",\n                   ".join(
        f"max(CASE WHEN s = {s} THEN cid END) AS c{s}" for s in range(n_sub)
    )
    return f"""
        WITH books(s, cid, c) AS (VALUES
            {book_vals}
        ), dt(s, cid, d) AS (VALUES
            {dt_vals}
        ), e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), n AS (
            SELECT vec_id,
                   CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm)
                        ELSE v END AS u
            FROM (SELECT vec_id, v,
                         sqrt(list_dot_product(v, v)) AS nrm FROM e)
        ), assigned AS (
            SELECT vec_id, s, cid FROM (
                SELECT n.vec_id, b.s, b.cid,
                       row_number() OVER (
                           PARTITION BY n.vec_id, b.s
                           ORDER BY list_distance(
                               list_slice(n.u, b.s * {sub} + 1,
                                          b.s * {sub} + {sub}), b.c),
                                    b.cid) AS rn
                FROM n CROSS JOIN books b
            ) WHERE rn = 1
        ), codes AS (
            SELECT vec_id,
                   {code_cols}
            FROM assigned GROUP BY vec_id
        )
        SELECT vec_id, round(1.0 - ({dist_expr}) / 2.0, 6) AS approx_cos
        FROM codes
        ORDER BY approx_cos DESC, vec_id
        LIMIT 20
    """


def _lsh_pairs_oracle_sql(sf_dir: str) -> str:
    """Generated oracle for embedding_near_dup_lsh — the last formerly
    rows-only probe: every ingredient of the multi-table hyperplane LSH
    pipeline is a deterministic seeded function, so DuckDB replays it
    whole. Plane matrices (make_planes LCG, per-table seeds) embed as
    literals; a pair is a candidate iff SOME table puts the two bucket
    codes within the multiprobe hamming radius (the engine's left-XOR
    expansion is exactly that predicate); candidates rerank by exact
    cosine >= threshold after the same round-to-4. The auto plane/table
    rules are replayed from the corpus row count."""
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    # the SAME auto rules the engine applies (shared helpers — no drift)
    n_planes = sim.planes_for_corpus(n)
    n_tables = sim._tables_for_recall(n_planes, 1)
    dim = len(_oracle_embeddings(sf_dir, limit=1)[0])
    tables = [
        sim.make_planes(dim, n_planes, seed=1009 + 7919 * t)
        for t in range(n_tables)
    ]
    plane_vals = ",\n            ".join(
        f"({t}, {i}, {tables[t][i]!r}::DOUBLE[])"
        for t in range(n_tables)
        for i in range(n_planes)
    )
    return f"""
        WITH planes(t, pid, plane) AS (VALUES
            {plane_vals}
        ), e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), b AS (
            SELECT e.vec_id, p.t,
                   CAST(sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
                                 THEN CAST(pow(2, p.pid) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS bucket
            FROM e CROSS JOIN planes p
            GROUP BY e.vec_id, p.t
        ), cand AS (
            SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
            FROM b a JOIN b c
              ON a.t = c.t AND a.vec_id < c.vec_id
            WHERE bit_count(xor(a.bucket, c.bucket)) <= 1
        )
        SELECT id_a, id_b, cos_sim FROM (
            SELECT s.id_a, s.id_b,
                   round(CASE WHEN den > 0 THEN num / den ELSE 0.0 END,
                         4) AS cos_sim
            FROM (
                SELECT cand.id_a, cand.id_b,
                       list_dot_product(ea.v, eb.v) AS num,
                       sqrt(list_dot_product(ea.v, ea.v))
                         * sqrt(list_dot_product(eb.v, eb.v)) AS den
                FROM cand
                JOIN e ea ON ea.vec_id = cand.id_a
                JOIN e eb ON eb.vec_id = cand.id_b
            ) s
        )
        WHERE cos_sim >= 0.5
    """


# Bloom family: DuckDB replays the identical md5 -> (h1, h2) ->
# Kirsch-Mitzenmacher position -> 32-bit-word bit_or arithmetic; every
# value stays positive and < 2^36, overflow-free on both engines.
# Count-min sketch: exact int64 counters over md5/KM probe cells; the
# whole build/probe/min chain replays in SQL with no tolerance.
ORACLE_SQL["heavy_hitters_cms"] = """
    WITH hh AS (
        SELECT user_id,
               CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8) AS BIGINT)
                 AS h1,
               CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),9,8) AS BIGINT)
                 AS h2
        FROM events
    ),
    cells AS (SELECT i AS r, ((h1 + i*h2) % 256) AS c
              FROM hh, unnest(range(0,4)) u(i)),
    sk AS (SELECT r, c, count(*)::BIGINT AS cnt FROM cells GROUP BY r, c),
    truth AS (SELECT user_id, count(*)::BIGINT AS true_count
              FROM events GROUP BY user_id),
    keys AS (
        SELECT user_id,
               CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8) AS BIGINT)
                 AS h1,
               CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),9,8) AS BIGINT)
                 AS h2
        FROM truth
    ),
    probes AS (SELECT user_id, i AS r, ((h1 + i*h2) % 256) AS c
               FROM keys, unnest(range(0,4)) u(i)),
    est AS (SELECT p.user_id, min(coalesce(s.cnt, 0)) AS est_count
            FROM probes p LEFT JOIN sk s ON s.r = p.r AND s.c = p.c
            GROUP BY p.user_id)
    SELECT t.user_id, t.true_count, e.est_count
    FROM truth t JOIN est e USING (user_id)
    WHERE e.est_count >= 60
"""

# Hashed linear classifier: integer milli-weights make the per-doc sum
# exact int64 on both engines; the logit is one double division.
ORACLE_SQL["quality_classifier_scores"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
        FROM documents
    ),
    tb AS (SELECT doc_id,
                  (CAST('0x'||substr(md5(tok),1,8) AS BIGINT) % 4096) AS bucket
           FROM tok WHERE tok <> ''),
    w AS (SELECT i AS bucket,
                 (CAST('0x'||substr(md5(CAST(i AS VARCHAR)),9,8) AS BIGINT)
                    % 2001 - 1000) AS w_milli
          FROM unnest(range(0, 4096)) u(i)),
    j AS (SELECT tb.doc_id, coalesce(w.w_milli, 0) AS wm
          FROM tb LEFT JOIN w USING (bucket))
    SELECT doc_id,
           count(*) AS n_terms,
           sum(wm)::BIGINT AS w_milli_sum,
           (sum(wm)::BIGINT / (1000.0 * count(*))) > 0 AS keep
    FROM j GROUP BY doc_id
"""

# SQ8: the one index family whose full pipeline (train = per-dim min/max
# aggregates, compress, score, rerank) is static SQL — every step is
# IEEE-double sub/div/floor, bit-identical across engines.
ORACLE_SQL["embedding_sq8_topk"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
    pm AS (SELECT d, min(v[d]) AS mn, max(v[d]) AS mx
           FROM e, unnest(range(1, len(v)+1)) u(d) GROUP BY d),
    pma AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
            FROM pm),
    deq AS (
        SELECT e.vec_id,
               list_transform(range(1, len(e.v)+1), i ->
                   CASE WHEN pma.mxs[i] > pma.mns[i]
                        THEN pma.mns[i]
                             + GREATEST(0.0, LEAST(255.0,
                                 floor((e.v[i] - pma.mns[i])
                                       / ((pma.mxs[i] - pma.mns[i]) / 255.0))))
                               * ((pma.mxs[i] - pma.mns[i]) / 255.0)
                        ELSE pma.mns[i] END) AS dq
        FROM e CROSS JOIN pma),
    scored AS (
        SELECT d.vec_id,
               CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS sq_cos_raw
        FROM (
            SELECT d.vec_id,
                   list_dot_product(d.dq, q.q) AS num,
                   sqrt(list_dot_product(d.dq, d.dq))
                     * sqrt(list_dot_product(q.q, q.q)) AS den
            FROM deq d CROSS JOIN q
        ) d),
    top AS (SELECT vec_id, sq_cos_raw FROM scored
            ORDER BY sq_cos_raw DESC, vec_id LIMIT 20)
    SELECT t.vec_id,
           round(t.sq_cos_raw, 6) AS sq_cos,
           round(CASE WHEN eden > 0 THEN enum / eden ELSE 0.0 END, 6)
             AS exact_cos
    FROM (
        SELECT t.vec_id, t.sq_cos_raw,
               list_dot_product(e.v, q.q) AS enum,
               sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(q.q, q.q)) AS eden
        FROM top t JOIN e ON e.vec_id = t.vec_id CROSS JOIN q
    ) t
"""

ORACLE_SQL["bloom_incremental_dedup"] = """
    WITH hist AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
    inc AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 2 = 1),
    hh AS (SELECT CAST('0x'||substr(md5(text),1,8) AS BIGINT) AS h1,
                  CAST('0x'||substr(md5(text),9,8) AS BIGINT) AS h2
           FROM hist),
    hpos AS (SELECT ((h1 + i*h2) % 1024) AS pos
             FROM hh, unnest(range(0,4)) u(i)),
    words AS (SELECT pos // 32 AS word_idx,
                     bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
              FROM hpos GROUP BY 1),
    ih AS (SELECT doc_id, source, text,
                  CAST('0x'||substr(md5(text),1,8) AS BIGINT) AS h1,
                  CAST('0x'||substr(md5(text),9,8) AS BIGINT) AS h2
           FROM inc),
    probes AS (SELECT doc_id, ((h1 + i*h2) % 1024) AS pos
               FROM ih, unnest(range(0,4)) u(i)),
    hit AS (SELECT p.doc_id,
                   bool_and(w.word IS NOT NULL
                            AND ((w.word >> CAST(p.pos % 32 AS INT)) & 1) = 1)
                     AS maybe
            FROM probes p LEFT JOIN words w ON w.word_idx = p.pos // 32
            GROUP BY p.doc_id),
    labeled AS (
        SELECT i.source, h.maybe,
               (h.maybe AND EXISTS (SELECT 1 FROM hist x WHERE x.text = i.text))
                 AS is_dup
        FROM ih i JOIN hit h ON h.doc_id = i.doc_id)
    SELECT source,
           count(*) AS n_incoming,
           sum(CASE WHEN NOT maybe THEN 1 ELSE 0 END)::BIGINT AS n_definite_new,
           sum(CASE WHEN maybe THEN 1 ELSE 0 END)::BIGINT AS n_candidate_dup,
           sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_true_dup,
           sum(CASE WHEN maybe AND NOT is_dup THEN 1 ELSE 0 END)::BIGINT
             AS n_false_pos
    FROM labeled GROUP BY source
"""

_WINNOW_FPS_CTE = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
        FROM documents
    ), grams AS (
        SELECT doc_id, u.i - 1 AS pos,
               array_to_string(t[u.i : u.i + 4], ' ') AS shingle
        FROM toks, unnest(generate_series(1, len(t) - 4)) u(i)
        WHERE len(t) >= 5
        UNION ALL
        SELECT doc_id, 0 AS pos, array_to_string(t, ' ') AS shingle
        FROM toks WHERE len(t) < 5
    ), hx AS (
        SELECT doc_id, pos,
               CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) AS hi,
               CAST(concat('0x', substr(md5(shingle), 9, 8)) AS BIGINT) AS lo
        FROM grams
    ), hv AS (
        -- the engine's shiftleft(hi,32)|lo wraps into the sign bit; the
        -- same two's-complement value via signed arithmetic
        SELECT doc_id, pos,
               (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
                 * 4294967296 + lo AS hv
        FROM hx
    ), wmin AS (
        SELECT doc_id,
               min(hv) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
        FROM hv
    ), fps AS (
        SELECT DISTINCT doc_id, fp FROM wmin
    )
"""

ORACLE_SQL["winnow_plagiarism_pairs"] = _WINNOW_FPS_CTE + """
    , dfc AS (
        SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 50
    ), sel AS (
        SELECT f.doc_id, f.fp FROM fps f JOIN dfc USING (fp)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS n_shared
    FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
"""

ORACLE_SQL["winnow_fingerprint_stats"] = _WINNOW_FPS_CTE + """
    , ng AS (
        SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
    ), nf AS (
        SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id
    )
    SELECT ng.doc_id AS doc_id, n_grams, n_fp,
           n_fp / n_grams::DOUBLE AS fp_frac
    FROM ng JOIN nf USING (doc_id)
"""

ORACLE_SQL["bloom_words_profile"] = """
    WITH hh AS (SELECT CAST('0x'||substr(md5(text),1,8) AS BIGINT) AS h1,
                       CAST('0x'||substr(md5(text),9,8) AS BIGINT) AS h2
                FROM documents),
    pos AS (SELECT ((h1 + i*h2) % 32768) AS pos
            FROM hh, unnest(range(0,4)) u(i)),
    words AS (SELECT pos // 32 AS word_idx,
                     bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
              FROM pos GROUP BY 1)
    SELECT count(*) AS n_words,
           sum(bit_count(word))::BIGINT AS n_set_bits,
           sum(word_idx * word)::BIGINT AS words_checksum,
           min(word_idx) AS min_word_idx,
           max(word_idx) AS max_word_idx
    FROM words
"""

ORACLE_SQL["hll_distinct_users"] = f"""
    WITH est AS ({hl.hll_oracle_sql("events", "CAST(user_id AS VARCHAR)",
                                    ["event_type"], p=10)}),
    exact AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
              FROM events GROUP BY 1)
    SELECT est.event_type, est.estimate, exact.exact_distinct,
           round(abs(est.estimate - exact.exact_distinct)
                 / exact.exact_distinct, 4) AS rel_err
    FROM est JOIN exact ON est.event_type = exact.event_type
    ORDER BY est.event_type
"""

# the union-by-max of per-type registers collapses to the same GROUP BY
# as a direct build (max of maxes), so the oracle replays both sides
# from one register CTE and the equality check is exact by construction
# on the DuckDB side too — what's being checked cross-engine is that the
# DISTRIBUTED merge produced the identical registers/estimate
ORACLE_SQL["hll_register_union"] = f"""
    WITH u_est AS ({hl.hll_oracle_sql("events", "CAST(user_id AS VARCHAR)",
                                      [], p=10)}),
    regs AS (
        SELECT CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8) AS BIGINT)
                 % 1024 AS bucket,
               max(CASE WHEN CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),9,8)
                                  AS BIGINT) = 0 THEN 33
                        ELSE 33 - length(bin(
                            CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),9,8)
                                 AS BIGINT))) END) AS register
        FROM events WHERE user_id IS NOT NULL GROUP BY 1)
    SELECT u.estimate AS union_estimate,
           u.estimate AS direct_estimate,
           TRUE AS union_equals_direct,
           (SELECT sum(bucket * register)::BIGINT FROM regs) AS register_checksum,
           (SELECT count(*) FROM regs) AS n_registers
    FROM u_est u
"""

ORACLE_SQL["hll_intersection_users"] = f"""
    WITH ea AS ({hl.hll_oracle_sql("events", "CAST(user_id AS VARCHAR)", [],
                                   p=10, where="WHERE event_type = 'view'")}),
    eb AS ({hl.hll_oracle_sql("events", "CAST(user_id AS VARCHAR)", [],
                              p=10,
                              where="WHERE event_type = 'purchase'")}),
    eu AS ({hl.hll_oracle_sql("events", "CAST(user_id AS VARCHAR)", [],
                              p=10,
                              where="WHERE event_type IN ('view', 'purchase')")}),
    exact AS (
        SELECT count(*) AS exact_both FROM (
            SELECT user_id FROM events WHERE event_type = 'view'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase')
    )
    SELECT ea.estimate AS est_viewers, eb.estimate AS est_buyers,
           eu.estimate AS est_union,
           round(ea.estimate + eb.estimate - eu.estimate, 4) AS est_both,
           exact_both
    FROM ea, eb, eu, exact
"""

ORACLE_SQL["bm25_topk_docs"] = rtr.bm25_oracle_sql(_BM25_QUERIES, k=5)

# shared replay of the degree-oriented triangle pipeline (canonical
# edges -> degrees -> (deg, id) orientation -> wedge join -> canonical
# closure) for both cosupplier_* oracles
_TRIANGLE_CTE = """
    WITH li AS (
        SELECT l_orderkey, l_suppkey FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00')
    ), edges AS (
        SELECT DISTINCT least(x.l_suppkey, y.l_suppkey) AS a,
                        greatest(x.l_suppkey, y.l_suppkey) AS b
        FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                           AND x.l_suppkey <> y.l_suppkey
    ), deg AS (
        SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM edges
            UNION ALL SELECT b AS node FROM edges) t
        GROUP BY 1
    ), oriented AS (
        SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
                    THEN a ELSE b END AS u,
               CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
                    THEN b ELSE a END AS v
        FROM edges
        JOIN deg da ON da.node = a
        JOIN deg db ON db.node = b
    ), wedges AS (
        SELECT w1.u, w1.v AS v1, w2.v AS v2
        FROM oriented w1 JOIN oriented w2
          ON w1.u = w2.u AND w1.v < w2.v
    ), tri AS (
        SELECT u, v1, v2 FROM wedges
        WHERE EXISTS (SELECT 1 FROM edges e WHERE e.a = v1 AND e.b = v2)
    )
"""

ORACLE_SQL["cosupplier_triangle_stats"] = _TRIANGLE_CTE + """
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM edges) AS n_edges,
           (SELECT CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) FROM deg) AS n_wedges,
           (SELECT count(*) FROM tri) AS n_triangles,
           round(3.0 * (SELECT count(*) FROM tri)
                 / (SELECT CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) FROM deg),
                 6) AS clustering_coeff
"""

ORACLE_SQL["zorder_events_profile"] = f"""
    WITH base AS (
        SELECT user_id AS uid,
               CAST(floor(epoch(ts)) AS BIGINT) AS secs
        FROM events
    ), rng AS (
        SELECT min(uid) AS umin, max(uid) AS umax,
               min(secs) AS smin, max(secs) AS smax
        FROM base
    ), q AS (
        SELECT ((uid - umin) * 65535) // greatest(umax - umin, 1) AS qx,
               ((secs - smin) * 65535) // greatest(smax - smin, 1) AS qy
        FROM base, rng
    ), zb AS (
        SELECT ({lay.morton_z_sql("qx", "qy", 16)}) >> 26 AS bucket,
               qx AS x, qy AS y
        FROM q
    )
    SELECT bucket, count(*) AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max,
           max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
    FROM zb GROUP BY bucket ORDER BY bucket
"""

ORACLE_SQL["zorder_write_audit"] = f"""
    WITH base AS (
        SELECT CAST(event_id AS BIGINT) AS eid,
               CAST(user_id AS BIGINT) AS uid,
               CAST(floor(epoch(ts)) AS BIGINT) AS secs
        FROM events
    ), rng AS (
        SELECT min(uid) AS umin, max(uid) AS umax,
               min(secs) AS smin, max(secs) AS smax
        FROM base
    ), q AS (
        SELECT eid, uid, secs,
               ((uid - umin) * 65535) // greatest(umax - umin, 1) AS qx,
               ((secs - smin) * 65535) // greatest(smax - smin, 1) AS qy
        FROM base, rng
    ), zb AS (
        SELECT ({lay.morton_z_sql("qx", "qy", 16)}) >> 26 AS zbucket,
               eid, uid, secs
        FROM q
    )
    SELECT zbucket, count(*) AS n_rows,
           min(uid) AS u_min, max(uid) AS u_max,
           min(secs) AS s_min, max(secs) AS s_max,
           sum(eid)::BIGINT AS id_checksum
    FROM zb GROUP BY zbucket ORDER BY zbucket
"""

ORACLE_SQL["snapshot_diff_orders"] = """
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 6
    ), new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.5
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 4
    ), diff AS (
        SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                     AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                    THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT status, count(*) AS n_rows, sum(o_orderkey)::BIGINT AS key_checksum
    FROM diff GROUP BY status ORDER BY status
"""

ORACLE_SQL["cosupplier_triangle_nodes"] = _TRIANGLE_CTE + """
    SELECT node, count(*) AS n_triangles
    FROM (SELECT unnest([u, v1, v2]) AS node FROM tri) corners
    GROUP BY 1
    ORDER BY n_triangles DESC, node
    LIMIT 25
"""

ORACLE_SQL["bm25_term_stats"] = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS term
        FROM documents
    ), postings AS (
        SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
        GROUP BY 1, 2
    ), dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, round(avg(dl), 4) AS avgdl FROM dl),
    dfreq AS (
        SELECT term, count(DISTINCT doc_id) AS df
        FROM postings
        WHERE term IN ({", ".join(sorted({f"'{t}'" for ts in _BM25_QUERIES.values() for t in ts}))})
        GROUP BY 1)
    SELECT term, df,
           round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)), 6) AS idf,
           n_docs, avgdl
    FROM dfreq, stats
    ORDER BY term
"""

ORACLE_SQL["events_daily_resampled"] = """
    WITH obs AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_start,
               count(*) AS n_events,
               sum(CAST(floor(value * 1000000) AS BIGINT))
                   / (count(value) * 1000000.0) AS day_avg
        FROM events GROUP BY 1, 2
    ), spans AS (
        SELECT user_id, min(day_start) AS b0, max(day_start) AS b1
        FROM obs GROUP BY 1
    ), grid AS (
        SELECT user_id,
               unnest(generate_series(b0, b1, 86400)) AS day_start
        FROM spans
    )
    SELECT g.user_id, g.day_start,
           CAST(coalesce(o.n_events, 0) AS BIGINT) AS n_events,
           last_value(o.day_avg IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.day_start)
               AS filled_avg_value
    FROM grid g LEFT JOIN obs o
      ON o.user_id = g.user_id AND o.day_start = g.day_start
"""

ORACLE_SQL["user_scd2_type_history"] = """
    WITH ordered AS (
        SELECT user_id, event_type, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS es,
               row_number() OVER w AS rn,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    ), changes AS (
        SELECT user_id, event_type, es, event_id FROM ordered
        WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           es AS valid_from,
           lead(es) OVER w AS valid_to,
           CAST(row_number() OVER w AS INTEGER) AS version_n,
           lead(es) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
"""

ORACLE_SQL["orders_quality_audit"] = """
    WITH base AS (
        SELECT 'orders.o_custkey.complete' AS "constraint",
               round(CAST(count(o_custkey) AS DOUBLE) / count(*), 6) AS metric
        FROM orders
        UNION ALL
        SELECT 'orders.o_orderkey.unique',
               round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 6)
        FROM orders
        UNION ALL
        SELECT 'orders.o_custkey.unique_probe',
               round(CAST(count(DISTINCT o_custkey) AS DOUBLE) / count(*), 6)
        FROM orders
        UNION ALL
        SELECT 'orders.o_totalprice.positive',
               round(avg(CASE WHEN o_totalprice > 0 THEN 1.0 ELSE 0.0 END), 6)
        FROM orders
        UNION ALL
        SELECT 'orders.o_orderstatus.domain',
               round(avg(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                              THEN 1.0 ELSE 0.0 END), 6)
        FROM orders
        UNION ALL
        SELECT 'orders.o_custkey.ref_customer',
               round(avg(CASE WHEN c._pk IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
        FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey AS _pk
                                 FROM customer) c
          ON o.o_custkey = c._pk
    )
    SELECT "constraint", metric, metric >= 1.0 AS passed
    FROM base ORDER BY "constraint"
"""

# shared dirty-customer + blocked-pair replay for both linkage oracles:
# the same per-key perturbation arithmetic as _DIRTY_NAME_EXPR, verbatim
_LINKAGE_CTE = f"""
    WITH dirty AS (
        SELECT c_custkey AS d_key, c_nationkey,
               {_DIRTY_NAME_EXPR} AS d_name
        FROM customer
    ), pairs AS (
        SELECT d.d_key, c.c_custkey,
               levenshtein(substr(d.d_name, 10), substr(c.c_name, 10))
                   AS distance
        FROM dirty d JOIN customer c ON d.c_nationkey = c.c_nationkey
        WHERE abs(length(d.d_name) - length(c.c_name)) <= 2
          AND levenshtein(substr(d.d_name, 10), substr(c.c_name, 10)) <= 2
    )
"""

ORACLE_SQL["fuzzy_customer_linkage"] = _LINKAGE_CTE + """
    SELECT CAST(distance AS INTEGER) AS distance,
           count(*) AS n_pairs,
           sum(d_key) AS dirty_checksum,
           sum(c_custkey) AS clean_checksum
    FROM pairs GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["fuzzy_linkage_auto_dispatch"] = ORACLE_SQL["fuzzy_customer_linkage"]

# two-pass fine blocking replayed verbatim: same keys, UNION dedup,
# same length prefilter + banded-metric acceptance as blocked_pairs
ORACLE_SQL["fuzzy_customer_linkage_fine_block"] = f"""
    WITH dirty AS (
        SELECT c_custkey AS d_key, c_nationkey,
               {_DIRTY_NAME_EXPR} AS d_name
        FROM customer
    ), d2 AS (
        SELECT d_key, c_nationkey, substr(d_name, 10) AS d_suffix
        FROM dirty
    ), c2 AS (
        SELECT c_custkey, c_nationkey, substr(c_name, 10) AS c_suffix
        FROM customer
    ), cand AS (
        SELECT d.d_key, d.d_suffix, c.c_custkey, c.c_suffix
        FROM d2 d JOIN c2 c
          ON d.c_nationkey = c.c_nationkey
         AND substr(d.d_suffix, 1, 5) = substr(c.c_suffix, 1, 5)
        UNION
        SELECT d.d_key, d.d_suffix, c.c_custkey, c.c_suffix
        FROM d2 d JOIN c2 c
          ON d.c_nationkey = c.c_nationkey
         AND substr(d.d_suffix, length(d.d_suffix) - 3, 4)
             = substr(c.c_suffix, length(c.c_suffix) - 3, 4)
    ), pairs AS (
        SELECT d_key, c_custkey,
               levenshtein(d_suffix, c_suffix) AS distance
        FROM cand
        WHERE abs(length(d_suffix) - length(c_suffix)) <= 2
          AND levenshtein(d_suffix, c_suffix) <= 2
    )
    SELECT CAST(distance AS INTEGER) AS distance,
           count(*) AS n_pairs,
           sum(d_key) AS dirty_checksum,
           sum(c_custkey) AS clean_checksum,
           sum(CASE WHEN d_key = c_custkey THEN 1 ELSE 0 END)::BIGINT
               AS n_true
    FROM pairs GROUP BY 1 ORDER BY 1
"""

# three-way dispatch decision replayed from first principles: both
# EXACT budgets (blocked block-product, fine distinct-text multi-pass
# sum) recomputed in SQL, then the argmin under the 1.5x fine handicap
# (3*fine < 2*blocked in integer form). The PassJoin arm is engine-side
# sampling but provably out of contention on this corpus (estimate
# tracks the blocked budget within noise, 2x overhead) — pinned by
# tests/test_linkage_dispatch.
ORACLE_SQL["linkage_dispatch_3way"] = f"""
    WITH dirty AS (
        SELECT c_custkey AS d_key, c_nationkey,
               {_DIRTY_NAME_EXPR} AS d_name
        FROM customer
    ), d2 AS (
        SELECT d_key, c_nationkey, substr(d_name, 10) AS d_suffix
        FROM dirty
    ), c2 AS (
        SELECT c_custkey, c_nationkey, substr(c_name, 10) AS c_suffix
        FROM customer
    ), blocked AS (
        SELECT CAST(COALESCE(SUM(l.ln * r.rn), 0) AS BIGINT) AS b
        FROM (SELECT c_nationkey, count(*) AS ln FROM d2 GROUP BY 1) l
        JOIN (SELECT c_nationkey, count(*) AS rn FROM c2 GROUP BY 1) r
          USING (c_nationkey)
    ), dl AS (
        SELECT DISTINCT c_nationkey, d_suffix FROM d2
    ), dr AS (
        SELECT DISTINCT c_nationkey, c_suffix FROM c2
    ), p1 AS (
        SELECT CAST(COALESCE(SUM(a.ln * b.rn), 0) AS BIGINT) AS f
        FROM (SELECT c_nationkey, substr(d_suffix, 1, 5) AS k,
                     count(*) AS ln
              FROM dl GROUP BY 1, 2) a
        JOIN (SELECT c_nationkey, substr(c_suffix, 1, 5) AS k,
                     count(*) AS rn
              FROM dr GROUP BY 1, 2) b
          USING (c_nationkey, k)
    ), p2 AS (
        SELECT CAST(COALESCE(SUM(a.ln * b.rn), 0) AS BIGINT) AS f
        FROM (SELECT c_nationkey,
                     substr(d_suffix, length(d_suffix) - 3, 4) AS k,
                     count(*) AS ln
              FROM dl GROUP BY 1, 2) a
        JOIN (SELECT c_nationkey,
                     substr(c_suffix, length(c_suffix) - 3, 4) AS k,
                     count(*) AS rn
              FROM dr GROUP BY 1, 2) b
          USING (c_nationkey, k)
    )
    SELECT CASE WHEN 3 * (p1.f + p2.f) < 2 * blocked.b
                THEN 'fine_block' ELSE 'blocked' END AS strategy,
           blocked.b AS blocked_budget,
           CAST(p1.f + p2.f AS BIGINT) AS fine_budget
    FROM blocked, p1, p2
"""

ORACLE_SQL["linkage_self_match_rate"] = _LINKAGE_CTE + """
    , best AS (
        SELECT d_key, c_custkey,
               row_number() OVER (PARTITION BY d_key
                                  ORDER BY distance, c_custkey) AS rn
        FROM pairs
    )
    SELECT count(*) AS n_matched,
           sum(CASE WHEN d_key = c_custkey THEN 1 ELSE 0 END)::BIGINT
               AS n_self,
           round(avg(CASE WHEN d_key = c_custkey THEN 1.0 ELSE 0.0 END), 6)
               AS self_match_rate
    FROM best WHERE rn = 1
"""

ORACLE_SQL["event_value_quantile_hist"] = """
    WITH hist AS (
        -- 8e0-style literals: a bare 8.0 is DECIMAL in DuckDB and
        -- would silently retype the arithmetic away from Spark's
        SELECT event_type,
               CAST(least(greatest(floor((value - 0e0) / 8e0), 0), 63)
                    AS INTEGER) AS bin,
               count(*) AS cnt
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, bin,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS n_total
        FROM hist
    ), probs AS (
        SELECT CAST(0.5 AS DOUBLE) AS p
        UNION ALL SELECT CAST(0.9 AS DOUBLE)
        UNION ALL SELECT CAST(0.99 AS DOUBLE)
    ), hit AS (
        SELECT c.event_type, pr.p, c.n_total, min(c.bin) AS bin
        FROM cum c CROSS JOIN probs pr
        WHERE c.cum >= ceil(pr.p * c.n_total)
        GROUP BY 1, 2, 3
    )
    SELECT event_type, p,
           CAST(ceil(p * n_total) AS BIGINT) AS rank,
           n_total, bin,
           0e0 + (bin + 1) * 8e0 AS q_upper
    FROM hit
"""

# recursive min-dist reachability over the SAME canonical co-supplier
# edges the triangle CTE defines (RECURSIVE applies to the whole WITH
# clause; the unused deg/oriented/wedges/tri CTEs bind lazily)
ORACLE_SQL["khop_supplier_reach"] = _TRIANGLE_CTE.replace(
    "WITH li AS (", "WITH RECURSIVE li AS (", 1
) + """
    , und AS (
        SELECT a AS src, b AS dst FROM edges
        UNION ALL
        SELECT b AS src, a AS dst FROM edges
    ), seeds AS (
        SELECT node AS root FROM (
            SELECT a AS node FROM edges
            UNION
            SELECT b AS node FROM edges
        ) ORDER BY node LIMIT 3
    ), reach(root, node, dist) AS (
        SELECT root, root, 0 FROM seeds
        UNION
        SELECT r.root, u.dst, r.dist + 1
        FROM reach r JOIN und u ON u.src = r.node
        WHERE r.dist < 3
    ), mind AS (
        SELECT root, node, min(dist) AS dist FROM reach GROUP BY 1, 2
    )
    SELECT root, CAST(dist AS INTEGER) AS dist,
           count(*) AS n_nodes, sum(node) AS node_checksum
    FROM mind GROUP BY 1, 2 ORDER BY 1, 2
"""


def _pagerank_oracle_sql(sf_dir: str) -> str:
    """Independent single-process replay of the distributed PageRank:
    fetch the SAME distinct customer-supplier edge set outside Spark,
    run the identical integer recursion (graph.pagerank.pagerank_replay
    — python ints, no floats anywhere), and embed the resulting top-20
    supplier masses as a VALUES literal. Nothing is shared with the
    Spark path but the formulas; a wrong distributed join/aggregation
    shows up as a mass mismatch."""
    import duckdb
    import numpy as np

    from ..graph.pagerank import pagerank_replay_np

    con = duckdb.connect()
    pairs = con.execute(
        "SELECT DISTINCT o.o_custkey * 2 AS s, l.l_suppkey * 2 + 1 AS d "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') l "
        f"JOIN read_parquet('{sf_dir}/orders.parquet') o "
        "ON l.l_orderkey = o.o_orderkey"
    ).fetchnumpy()
    con.close()
    # the vectorized replay is bit-equal to graph.pagerank.pagerank_replay
    # (tests/test_pagerank.py) and makes the sf1 oracle build seconds
    # instead of tens of minutes (round-7 verdict #2)
    s = np.asarray(pairs["s"], dtype=np.int64)
    d = np.asarray(pairs["d"], dtype=np.int64)
    mass = pagerank_replay_np(
        np.concatenate([s, d]), np.concatenate([d, s]), n_iter=5
    )
    supp = [((node - 1) // 2, m) for node, m in mass.items() if node % 2 == 1]
    top = sorted(supp, key=lambda t: (-t[1], t[0]))[:20]
    values = ",\n            ".join(f"({k}, {m})" for k, m in top)
    return f"""
        SELECT suppkey, mass FROM (VALUES
            {values}
        ) AS t(suppkey, mass)
    """


def _lpa_oracle_sql(sf_dir: str) -> str:
    """Independent single-process replay of the distributed label
    propagation: fetch the SAME canonical co-supplier edge set outside
    Spark (1997 Q1 window, matching _cosupplier_edges), run the
    identical synchronous integer recursion (graph.lpa.lpa_replay), and
    embed the community sizes as a VALUES literal. Only the rules are
    shared with the Spark path — a wrong distributed join/aggregate
    shows up as a size mismatch."""
    import duckdb
    import numpy as np

    from ..graph.lpa import lpa_replay_np

    con = duckdb.connect()
    pairs = con.execute(
        "SELECT DISTINCT least(x.l_suppkey, y.l_suppkey) AS a, "
        "       greatest(x.l_suppkey, y.l_suppkey) AS b "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') x "
        f"JOIN read_parquet('{sf_dir}/lineitem.parquet') y "
        "  ON x.l_orderkey = y.l_orderkey AND x.l_suppkey <> y.l_suppkey "
        "WHERE x.l_orderkey IN ("
        f"  SELECT o_orderkey FROM read_parquet('{sf_dir}/orders.parquet')"
        "   WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'"
        "     AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00')"
    ).fetchnumpy()
    con.close()
    # vectorized replay, bit-equal to graph.lpa.lpa_replay
    # (tests/test_lpa.py) — sf1 oracle-build speed (round-7 verdict #2)
    a = np.asarray(pairs["a"], dtype=np.int64)
    b = np.asarray(pairs["b"], dtype=np.int64)
    labels = lpa_replay_np(
        np.concatenate([a, b]), np.concatenate([b, a]), n_iter=4
    )
    from collections import Counter

    sizes = Counter(labels.values())
    rows = sorted(sizes.items(), key=lambda t: (-t[1], t[0]))
    values = ",\n            ".join(f"({c}, {n})" for c, n in rows)
    return f"""
        SELECT community, n_members FROM (VALUES
            {values}
        ) AS t(community, n_members)
    """


def _kcore_oracle_sql(sf_dir: str) -> str:
    """Independent single-process replay of the distributed k-core peel
    (graph.kcore.kcore_replay) over the SAME co-supplier edge set,
    embedded as a 1-row VALUES literal. The fixpoint is unique, so any
    correct peel must land on these exact counts/checksum."""
    import duckdb
    import numpy as np

    from ..graph.kcore import kcore_replay_np

    con = duckdb.connect()
    pairs = con.execute(
        "SELECT DISTINCT least(x.l_suppkey, y.l_suppkey) AS a, "
        "       greatest(x.l_suppkey, y.l_suppkey) AS b "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') x "
        f"JOIN read_parquet('{sf_dir}/lineitem.parquet') y "
        "  ON x.l_orderkey = y.l_orderkey AND x.l_suppkey <> y.l_suppkey "
        "WHERE x.l_orderkey IN ("
        f"  SELECT o_orderkey FROM read_parquet('{sf_dir}/orders.parquet')"
        "   WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'"
        "     AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00')"
    ).fetchnumpy()
    con.close()
    # vectorized peel, bit-equal to graph.kcore.kcore_replay
    # (tests/test_kcore.py) — sf1 oracle-build speed (round-7 verdict #2)
    a = np.asarray(pairs["a"], dtype=np.int64)
    b = np.asarray(pairs["b"], dtype=np.int64)
    n_edges = int(len(a))
    n_nodes = int(len(np.unique(np.concatenate([a, b]))))
    # the SAME relative-k rule as kcore_supplier_stats: 70% of average
    # degree in exact integer arithmetic
    k = max(1, (14 * n_edges) // (10 * max(n_nodes, 1)))
    core = kcore_replay_np(a, b, k=k)
    nodes = {v for e in core for v in e}
    return f"""
        SELECT k, n_core_nodes, n_core_edges, node_checksum FROM (VALUES
            ({k}, {len(nodes)}, {len(core)}, {sum(nodes)})
        ) AS t(k, n_core_nodes, n_core_edges, node_checksum)
    """


def _kmeans_replay_centroids(sf_dir: str, k: int = 8, n_iter: int = 4):
    """INDEPENDENT single-process replay of the distributed k-means
    training (queries must pass k/n_iter matching _kmeans_cents): fetch
    the full gate corpus outside Spark, quantize with the same
    floor(x*2^20), seed from the same md5-of-id order, and iterate the
    same shared arithmetic (clu.assign_rows + clu.centroids_from_sums).
    Fixed-point sums are exact integers on both paths, so the returned
    centroids are bitwise-equal to Spark's IFF the distributed
    aggregation is correct — this is the check."""
    import hashlib

    import duckdb
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = [int(r[0]) for r in rows]
    x = np.array([[float(v) for v in r[1]] for r in rows], dtype=np.float64)
    q = np.floor(x * float(clu.QUANT_SCALE)).astype(np.int64)
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )
    cents = [
        [float(v) / clu.QUANT_SCALE for v in q[i]] for i in order[:k]
    ]
    for _ in range(n_iter):
        a, _ = clu.assign_rows(q, cents)
        stats = {}
        for cid in range(len(cents)):
            m = a == cid
            n = int(m.sum())
            if n:
                stats[cid] = (n, [int(s) for s in q[m].sum(axis=0)])
        cents = clu.centroids_from_sums(cents, stats)
    return cents, q.shape[1]


def _kmeans_cents_values_sql(sf_dir: str) -> tuple[str, int]:
    cents, dim = _kmeans_replay_centroids(sf_dir)
    values = ",\n            ".join(
        f"({i}, {cents[i]!r}::DOUBLE[])" for i in range(len(cents))
    )
    return values, dim


def _kmeans_assign_ctes(sf_dir: str) -> str:
    """Shared CTE chain: quantize -> dequantize -> distance to every
    centroid literal -> first-index argmin (ORDER BY d2, cid = numpy
    argmin tie rule). Float-parity scope (the build_artifact_oracles
    caveat): numpy sums d2 pairwise, DuckDB's list_sum sequentially, so
    per-row d2 can differ by ulps — which perturbs not only the rounded
    avg_dist2 but, for a vector near-EQUIDISTANT from two centroids
    (|Δd2| within ~1 ulp), the argmin itself, flipping that row's
    cluster and with it the integer count/sum columns. Same ~1e-9-per-
    run class as the IVF/PQ assignment replays; the integer columns are
    exact GIVEN agreeing assignments, not unconditionally."""
    values, dim = _kmeans_cents_values_sql(sf_dir)
    return f"""
        WITH cents(cid, c) AS (VALUES
            {values}
        ), e AS (
            SELECT vec_id,
                   list_transform(
                       embedding,
                       x -> CAST(floor(x * {float(clu.QUANT_SCALE)!r}) AS BIGINT)
                   ) AS q
            FROM embeddings
        ), x AS (
            SELECT vec_id,
                   list_transform(q, v -> v / {float(clu.QUANT_SCALE)!r}) AS xv
            FROM e
        ), d AS (
            SELECT vec_id, cid,
                   list_sum(list_transform(
                       range(1, {dim + 1}),
                       i -> (xv[i] - c[i]) * (xv[i] - c[i])
                   )) AS d2
            FROM x CROSS JOIN cents
        ), assigned AS (
            SELECT vec_id, cid, d2,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid)
                     AS rn
            FROM d
        )"""


def _kmeans_oracle_sql(sf_dir: str) -> str:
    return (
        _kmeans_assign_ctes(sf_dir)
        + """
        SELECT cid AS cluster,
               count(*) AS n_vecs,
               sum(vec_id) AS sum_vec_id,
               round(avg(d2), 6) AS avg_dist2
        FROM assigned WHERE rn = 1
        GROUP BY cid
    """
    )


def _kmeans_profile_oracle_sql(sf_dir: str) -> str:
    return (
        _kmeans_assign_ctes(sf_dir)
        + """
        SELECT a.cid AS cluster,
               dc.source AS source,
               count(*) AS n_docs,
               sum(dc.n_chars) AS sum_chars
        FROM assigned a JOIN documents dc ON dc.doc_id = a.vec_id
        WHERE a.rn = 1
        GROUP BY a.cid, dc.source
    """
    )




def _ivf_knn_join_oracle_sql(sf_dir: str) -> str:
    """Generated oracle for embedding_ivf_knn_join: centroids embed as
    DOUBLE[] literals (spherical_kmeans_core — the identical numpy
    trainer), then DuckDB replays per-query probe selection (dot DESC,
    cid DESC, nprobe=4), corpus assignment (argmax dot, ties to the
    higher cid), the pruned cosine, and the per-query (cos desc,
    neighbor asc) top-10 — a full value-check of the batch ANN join."""
    cents = sim.spherical_kmeans_core(_oracle_embeddings(sf_dir, limit=2048), 16)
    values = ",\n            ".join(
        f"({i}, {cents[i]!r}::DOUBLE[])" for i in range(len(cents))
    )
    return f"""
        WITH cents(cid, c) AS (VALUES
            {values}
        ), e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
        ), probe AS (
            SELECT query_id, cid, qv FROM (
                SELECT q.query_id, cents.cid, q.qv,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_dot_product(cents.c, q.qv) DESC,
                                    cents.cid DESC) AS rn
                FROM q CROSS JOIN cents
            ) WHERE rn <= 4
        ), assigned AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, cents.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_dot_product(e.v, cents.c) DESC,
                                    cents.cid DESC) AS rn
                FROM e CROSS JOIN cents
            ) WHERE rn = 1
        ), cand AS (
            SELECT probe.query_id, e.vec_id AS neighbor_id,
                   CASE WHEN sqrt(list_dot_product(e.v, e.v))
                           * sqrt(list_dot_product(probe.qv, probe.qv)) > 0
                        THEN list_dot_product(e.v, probe.qv)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(probe.qv, probe.qv)))
                        ELSE 0.0 END AS cos_raw
            FROM e
            JOIN assigned USING (vec_id)
            JOIN probe ON assigned.cid = probe.cid
        )
        SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos_sim,
               CAST(rnk AS INTEGER) AS rnk
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos_raw DESC, neighbor_id) AS rnk
            FROM cand
        ) WHERE rnk <= 10
        ORDER BY query_id, rnk
    """
