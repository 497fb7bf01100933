"""Registry chunk split out of plans/queries.py (round-9 hygiene): original lines 3883-5987. Definitions land in the shared QUERIES/ORACLE_SQL dicts at import; the spine (plans.queries) imports every chunk in original order and re-exports all names, so `from ..plans.queries import X` keeps working for every X."""
from __future__ import annotations

from .q_embed_pipeline import (  # noqa: E501
    _SPLIT_WEIGHTS,
    _STRAT_FRACTIONS,
    bloom_incremental_dedup,
    bloom_words_profile,
    bm25_term_stats,
    bm25_topk_docs,
    contamination_vs_benchmark,
    contrastive_negative_samples,
    contrastive_triplets,
    cosupplier_triangle_nodes,
    cosupplier_triangle_stats,
    domain_capped_sample,
    dsir_importance_weights,
    embedding_cosine_scores,
    embedding_ivf_knn_join,
    embedding_ivf_topk,
    embedding_knn_join,
    embedding_lsh_topk,
    embedding_near_dup_lsh,
    embedding_norm_stats,
    embedding_pq_topk,
    embedding_semdedup,
    embedding_sq8_topk,
    embedding_topk,
    event_value_quantile_hist,
    events_daily_resampled,
    fuzzy_customer_linkage,
    fuzzy_customer_linkage_fine_block,
    fuzzy_linkage_auto_dispatch,
    linkage_dispatch_3way,
    graph_degrees,
    graph_edges,
    graph_nodes,
    heavy_hitters_cms,
    hll_distinct_users,
    hll_intersection_users,
    hll_register_union,
    kcore_supplier_stats,
    khop_supplier_reach,
    kmeans_corpus_clusters,
    kmeans_domain_profile,
    lang_label_confusion,
    lang_mixing_weights,
    length_curriculum_buckets,
    linkage_self_match_rate,
    lpa_supplier_communities,
    multimodal_features,
    orders_quality_audit,
    pagerank_supplier_rank,
    pretrain_corpus_summary,
    pretrain_curated_docs,
    quality_classifier_scores,
    quality_filter_funnel,
    rag_passage_windows,
    sample_docs_hash,
    snapshot_diff_orders,
    soft_dedup_weights,
    source_near_dup_matrix,
    split_cluster_safe,
    split_leakage_pairs,
    stratified_sample_by_lang,
    token_count_histogram,
    top_trigrams,
    train_val_test_counts,
    user_scd2_type_history,
    winnow_fingerprint_stats,
    winnow_plagiarism_pairs,
    zorder_events_profile,
    zorder_write_audit,
)
from .q_relational import (  # noqa: E501
    anti_join_never_urgent,
    asof_latest_order_per_event,
    backfill_time_range,
    corr_price_quantity,
    cube_order_stats,
    dedup_exact_documents,
    distinct_buyers_per_segment,
    embedding_dedup_clusters,
    embedding_dedup_clusters_lsh,
    embedding_near_dup_pairs,
    events_value_delta,
    exists_late_shipment_orders,
    filter_dsl_and_or,
    filter_dsl_in_gt,
    hex_projection,
    join_left_ordered_agg,
    json_extract_sum,
    latest_event_per_user,
    moving_avg_user_value,
    ntile_balance_quartiles,
    percentile_price_by_flag,
    pivot_revenue_by_year,
    q10_returned_items,
    q11_important_part_value,
    q13_customer_distribution,
    q14_promo_revenue,
    q16_supplier_part_counts,
    q17_small_quantity_revenue,
    q18_large_volume_customers,
    q19_discounted_revenue,
    q1_pricing_summary,
    q20_excess_shippers,
    q21_late_shippers,
    q22_global_sales_opportunity,
    q2_min_cost_supplier,
    q3_top_orders,
    q4_order_priority,
    q5_region_nation_revenue,
    q6_forecast_revenue,
    q7_volume_shipping,
    q8_market_share,
    q9_product_profit,
    range_join_shipments,
    rollup_revenue,
    salted_event_stats,
    scalar_subquery_small_quantity_revenue,
    semi_join_buyers,
    sessionize_events,
    set_except_no_orders,
    set_intersect_buyers,
    sketch_order_stats,
    sliding_event_counts,
    top1_order,
    tumbling_event_counts,
    window_topn_per_group,
)
from .q_text_dedup import (  # noqa: E501
    balance_distribution_by_segment,
    bigram_logprob_score,
    boilerplate_chunk_removal,
    cohort_retention,
    copurchase_part_pairs,
    dedup_clusters,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_ngram_jaccard_allpairs,
    dedup_simhash,
    doc_novelty,
    epoch_shuffle_docs,
    event_funnel_steps,
    event_transition_matrix,
    events_interval_pairs,
    lang_mixing_temperature,
    orders_export_sorted,
    pack_training_sequences,
    passage_dedup_docs,
    q12_priority_shipping,
    q15_top_supplier,
    table_profile_orders,
    text_fingerprint,
    text_gopher_repetition,
    text_lang_id,
    text_pii_redaction,
    text_quality,
    text_repetition,
    text_substring_dup_stats,
    text_token_count,
    tfidf_top_terms,
    unigram_logprob_score,
    user_first_last_event,
    weighted_sample_docs,
)
from .queries import (  # noqa: E501
    DataFrame,
    SparkSession,
    smp,
)


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return q1_pricing_summary(spark, sf_dir)


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_region_nation_revenue": q5_region_nation_revenue,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_part_value": q11_important_part_value,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_late_shippers": q21_late_shippers,
    "filter_dsl_in_gt": filter_dsl_in_gt,
    "filter_dsl_and_or": filter_dsl_and_or,
    "backfill_time_range": backfill_time_range,
    "join_left_ordered_agg": join_left_ordered_agg,
    "events_value_delta": events_value_delta,
    "rollup_revenue": rollup_revenue,
    "cube_order_stats": cube_order_stats,
    "distinct_buyers_per_segment": distinct_buyers_per_segment,
    "semi_join_buyers": semi_join_buyers,
    "anti_join_never_urgent": anti_join_never_urgent,
    "range_join_shipments": range_join_shipments,
    "asof_latest_order_per_event": asof_latest_order_per_event,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "embedding_dedup_clusters": embedding_dedup_clusters,
    "embedding_dedup_clusters_lsh": embedding_dedup_clusters_lsh,
    "dedup_exact_documents": dedup_exact_documents,
    "latest_event_per_user": latest_event_per_user,
    "window_topn_per_group": window_topn_per_group,
    "top1_order": top1_order,
    "sketch_order_stats": sketch_order_stats,
    "salted_event_stats": salted_event_stats,
    "exists_late_shipment_orders": exists_late_shipment_orders,
    "scalar_subquery_small_quantity_revenue": scalar_subquery_small_quantity_revenue,
    "moving_avg_user_value": moving_avg_user_value,
    "percentile_price_by_flag": percentile_price_by_flag,
    "corr_price_quantity": corr_price_quantity,
    "ntile_balance_quartiles": ntile_balance_quartiles,
    "pivot_revenue_by_year": pivot_revenue_by_year,
    "set_intersect_buyers": set_intersect_buyers,
    "set_except_no_orders": set_except_no_orders,
    "json_extract_sum": json_extract_sum,
    "hex_projection": hex_projection,
    "tumbling_event_counts": tumbling_event_counts,
    "sessionize_events": sessionize_events,
    "text_token_count": text_token_count,
    "text_quality": text_quality,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_repetition": text_repetition,
    "text_pii_redaction": text_pii_redaction,
    "text_gopher_repetition": text_gopher_repetition,
    "text_substring_dup_stats": text_substring_dup_stats,
    "tfidf_top_terms": tfidf_top_terms,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_ngram_jaccard_allpairs": dedup_ngram_jaccard_allpairs,
    "dedup_clusters": dedup_clusters,
    "passage_dedup_docs": passage_dedup_docs,
    "boilerplate_chunk_removal": boilerplate_chunk_removal,
    "epoch_shuffle_docs": epoch_shuffle_docs,
    "doc_novelty": doc_novelty,
    "pack_training_sequences": pack_training_sequences,
    "table_profile_orders": table_profile_orders,
    "events_interval_pairs": events_interval_pairs,
    "weighted_sample_docs": weighted_sample_docs,
    "q15_top_supplier": q15_top_supplier,
    "q12_priority_shipping": q12_priority_shipping,
    "balance_distribution_by_segment": balance_distribution_by_segment,
    "user_first_last_event": user_first_last_event,
    "orders_export_sorted": orders_export_sorted,
    "cohort_retention": cohort_retention,
    "event_funnel_steps": event_funnel_steps,
    "event_transition_matrix": event_transition_matrix,
    "copurchase_part_pairs": copurchase_part_pairs,
    "sliding_event_counts": sliding_event_counts,
    "unigram_logprob_score": unigram_logprob_score,
    "bigram_logprob_score": bigram_logprob_score,
    "dedup_simhash": dedup_simhash,
    "embedding_near_dup_lsh": embedding_near_dup_lsh,
    "embedding_cosine_scores": embedding_cosine_scores,
    "embedding_topk": embedding_topk,
    "embedding_lsh_topk": embedding_lsh_topk,
    "embedding_ivf_topk": embedding_ivf_topk,
    "embedding_ivf_knn_join": embedding_ivf_knn_join,
    "embedding_pq_topk": embedding_pq_topk,
    "embedding_semdedup": embedding_semdedup,
    "embedding_knn_join": embedding_knn_join,
    "graph_edges": graph_edges,
    "graph_nodes": graph_nodes,
    "graph_degrees": graph_degrees,
    "multimodal_features": multimodal_features,
    "sample_docs_hash": sample_docs_hash,
    "train_val_test_counts": train_val_test_counts,
    "split_leakage_pairs": split_leakage_pairs,
    "split_cluster_safe": split_cluster_safe,
    "soft_dedup_weights": soft_dedup_weights,
    "bloom_incremental_dedup": bloom_incremental_dedup,
    "kmeans_corpus_clusters": kmeans_corpus_clusters,
    "kmeans_domain_profile": kmeans_domain_profile,
    "winnow_plagiarism_pairs": winnow_plagiarism_pairs,
    "winnow_fingerprint_stats": winnow_fingerprint_stats,
    "pagerank_supplier_rank": pagerank_supplier_rank,
    "bloom_words_profile": bloom_words_profile,
    "hll_distinct_users": hll_distinct_users,
    "hll_register_union": hll_register_union,
    "hll_intersection_users": hll_intersection_users,
    "bm25_topk_docs": bm25_topk_docs,
    "bm25_term_stats": bm25_term_stats,
    "cosupplier_triangle_stats": cosupplier_triangle_stats,
    "cosupplier_triangle_nodes": cosupplier_triangle_nodes,
    "snapshot_diff_orders": snapshot_diff_orders,
    "events_daily_resampled": events_daily_resampled,
    "user_scd2_type_history": user_scd2_type_history,
    "orders_quality_audit": orders_quality_audit,
    "fuzzy_customer_linkage": fuzzy_customer_linkage,
    "fuzzy_customer_linkage_fine_block": fuzzy_customer_linkage_fine_block,
    "fuzzy_linkage_auto_dispatch": fuzzy_linkage_auto_dispatch,
    "linkage_dispatch_3way": linkage_dispatch_3way,
    "linkage_self_match_rate": linkage_self_match_rate,
    "khop_supplier_reach": khop_supplier_reach,
    "event_value_quantile_hist": event_value_quantile_hist,
    "lpa_supplier_communities": lpa_supplier_communities,
    "kcore_supplier_stats": kcore_supplier_stats,
    "zorder_events_profile": zorder_events_profile,
    "zorder_write_audit": zorder_write_audit,
    "embedding_sq8_topk": embedding_sq8_topk,
    "quality_classifier_scores": quality_classifier_scores,
    "heavy_hitters_cms": heavy_hitters_cms,
    "lang_label_confusion": lang_label_confusion,
    "contrastive_negative_samples": contrastive_negative_samples,
    "contrastive_triplets": contrastive_triplets,
    "source_near_dup_matrix": source_near_dup_matrix,
    "length_curriculum_buckets": length_curriculum_buckets,
    "stratified_sample_by_lang": stratified_sample_by_lang,
    "domain_capped_sample": domain_capped_sample,
    "contamination_vs_benchmark": contamination_vs_benchmark,
    "top_trigrams": top_trigrams,
    "token_count_histogram": token_count_histogram,
    "lang_mixing_weights": lang_mixing_weights,
    "lang_mixing_temperature": lang_mixing_temperature,
    "dsir_importance_weights": dsir_importance_weights,
    "rag_passage_windows": rag_passage_windows,
    "quality_filter_funnel": quality_filter_funnel,
    "embedding_norm_stats": embedding_norm_stats,
    "pretrain_curated_docs": pretrain_curated_docs,
    "pretrain_corpus_summary": pretrain_corpus_summary,
}

# DuckDB oracle twins. Keys missing here (minhash/simhash/LSH/multimodal)
# are intentionally rows-only: their bucketing depends on engine hash
# functions and is not ANSI-SQL-expressible.
ORACLE_SQL: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_orders": """
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q5_region_nation_revenue": """
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY r_name, n_name
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": """
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
               round(sum(CASE WHEN n1.n_name = 'NATION_5'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_year
    """,
    "q9_product_profit": """
        SELECT n_name AS nation,
               CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
               CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity * 0.8) * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) AS sum_profit_cents
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_type = 'STANDARD'
        GROUP BY n_name, o_year
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "q14_promo_revenue": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    "q18_large_volume_customers": """
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice, total_qty
        FROM orders
        JOIN (
            SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 300
        ) big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q19_discounted_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
    "q22_global_sales_opportunity": """
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          )
        GROUP BY c_nationkey
    """,
    "q2_min_cost_supplier": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS supplycost
            FROM lineitem GROUP BY 1, 2
        ), eur AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), ps_eur AS (
            SELECT ps.l_partkey, ps.supplycost, eur.s_name, eur.s_acctbal, eur.n_name
            FROM ps JOIN eur ON l_suppkey = s_suppkey
        ), mc AS (
            SELECT l_partkey, min(supplycost) AS min_cost FROM ps_eur GROUP BY 1
        )
        SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
               round(supplycost, 6) AS supplycost
        FROM part
        JOIN ps_eur ON p_partkey = ps_eur.l_partkey
        JOIN mc ON ps_eur.l_partkey = mc.l_partkey AND supplycost = min_cost
        WHERE p_size BETWEEN 10 AND 15 AND p_type = 'STANDARD'
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q11_important_part_value": """
        WITH scoped AS (
            SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7'
        )
        SELECT l_partkey, round(sum(val), 2) AS part_value
        FROM scoped GROUP BY 1
        HAVING sum(val) > 0.001 * (SELECT sum(val) FROM scoped)
        ORDER BY part_value DESC, l_partkey
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q17_small_quantity_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = part.p_partkey)
    """,
    "q20_excess_shippers": """
        WITH shipped AS (
            SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2
        ), tot AS (
            SELECT l_partkey, sum(qty) AS tot_qty FROM shipped GROUP BY 1
        )
        SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND s_suppkey IN (
              SELECT l_suppkey FROM shipped
              JOIN tot ON shipped.l_partkey = tot.l_partkey
              WHERE qty > 0.5 * tot_qty)
        ORDER BY s_name
    """,
    "q21_late_shippers": """
        WITH fli AS (
            SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        )
        SELECT s_name, count(*) AS numwait
        FROM fli l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 365 DAY
          AND EXISTS (
              SELECT 1 FROM fli l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM fli l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > l3.o_orderdate + INTERVAL 365 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "filter_dsl_in_gt": """
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal > 1000.0
    """,
    "filter_dsl_and_or": """
        SELECT event_id, user_id, event_type, round(value, 2) AS value
        FROM events
        WHERE (event_type = 'purchase' AND value >= 100.0)
           OR event_type IN ('error')
    """,
    "backfill_time_range": """
        SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderstatus
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    """,
    "join_left_ordered_agg": """
        SELECT c_custkey, c_name, oa.order_ids, COALESCE(oa.n_orders, 0) AS n_orders
        FROM customer
        LEFT JOIN (
            SELECT o_custkey,
                   string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey DESC) AS order_ids,
                   count(*) AS n_orders
            FROM orders
            WHERE o_orderstatus <> 'F'
            GROUP BY o_custkey
        ) oa ON c_custkey = oa.o_custkey
    """,
    "events_value_delta": """
        SELECT user_id, event_id,
               round(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 2) AS value_delta
        FROM events
    """,
    "rollup_revenue": """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS total_price,
               count(*) AS n_orders
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "cube_order_stats": """
        SELECT o_orderstatus, o_orderpriority,
               round(avg(o_totalprice), 4) AS avg_price,
               count(*) AS n_orders
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "distinct_buyers_per_segment": """
        SELECT c_mktsegment,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_buyers,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "semi_join_buyers": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    "anti_join_never_urgent": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    "range_join_shipments": """
        SELECT o_orderpriority,
               count(*) AS n_fast_lines,
               round(sum(l_extendedprice), 2) AS fast_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
                   AND l_shipdate >= o_orderdate
                   AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        GROUP BY o_orderpriority
    """,
    "asof_latest_order_per_event": """
        SELECT event_id, user_id, o_orderkey
        FROM (
            SELECT e.event_id, e.user_id, o.o_orderkey,
                   row_number() OVER (PARTITION BY e.event_id
                                      ORDER BY o.o_orderdate DESC NULLS LAST,
                                               o.o_orderkey DESC NULLS LAST) AS rn
            FROM events e
            LEFT JOIN orders o
              ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
            WHERE e.event_type = 'purchase'
        )
        WHERE rn = 1
    """,
    "embedding_near_dup_pairs": """
        SELECT id_a, id_b,
               round(CASE WHEN den > 0 THEN num / den ELSE 0.0 END, 4) AS cos_sim
        FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS num,
                   sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])) AS den
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        )
        WHERE CASE WHEN den > 0 THEN num / den ELSE 0.0 END >= 0.5
    """,
    "dedup_exact_documents": """
        SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    "latest_event_per_user": """
        SELECT user_id, event_id, event_type, round(value, 2) AS value
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    "window_topn_per_group": """
        SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS INTEGER) AS rn
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
        )
        WHERE rn <= 3
    """,
    "top1_order": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 1
    """,
    "salted_event_stats": """
        SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY event_type
    """,
    "exists_late_shipment_orders": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
    """,
    "scalar_subquery_small_quantity_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l1
        WHERE l_quantity < (
            SELECT 0.5 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey
        )
    """,
    "moving_avg_user_value": """
        SELECT user_id, event_id,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
               ), 4) AS trailing_avg
        FROM events
    """,
    "percentile_price_by_flag": """
        SELECT l_returnflag,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4)
                   AS price_p50,
               round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4)
                   AS price_p90
        FROM lineitem GROUP BY l_returnflag
    """,
    "corr_price_quantity": """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
               round(stddev_samp(l_quantity), 4) AS qty_stddev,
               round(stddev_samp(l_extendedprice), 2) AS price_stddev
        FROM lineitem GROUP BY l_returnflag
    """,
    "ntile_balance_quartiles": """
        SELECT c_custkey, c_nationkey,
               ntile(4) OVER (
                   PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
               ) AS balance_quartile
        FROM customer
    """,
    "pivot_revenue_by_year": """
        SELECT o_orderpriority,
               round(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
                              THEN o_totalprice END), 2) AS rev_1995,
               round(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
                              THEN o_totalprice END), 2) AS rev_1996,
               round(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
                              THEN o_totalprice END), 2) AS rev_1997
        FROM orders GROUP BY o_orderpriority
    """,
    "set_intersect_buyers": """
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
    "set_except_no_orders": """
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
    """,
    "json_extract_sum": """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    "hex_projection": """
        SELECT doc_id, '0x' || lower(hex(source)) AS source_hex FROM documents
    """,
    "tumbling_event_counts": """
        SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "sessionize_events": """
        SELECT user_id, session_idx,
               min(es) AS session_start,
               max(es) AS session_end,
               count(*) AS n_events
        FROM (
            SELECT user_id, es,
                   CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM (
                SELECT user_id, ts, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS es,
                       CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT))
                                 OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                              OR CAST(floor(epoch(ts)) AS BIGINT)
                                 - lag(CAST(floor(epoch(ts)) AS BIGINT))
                                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                            THEN 1 ELSE 0 END AS is_new
                FROM events
            )
        )
        GROUP BY user_id, session_idx
    """,
    "text_token_count": """
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]+')) AS INTEGER) AS n_bpe_tokens
        FROM documents
    """,
    "text_quality": """
        SELECT doc_id, round((
                 least(1.0, n_tokens / 20.0)
                 + alpha / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END)
                 + (1.0 - punct / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END))
                 + least(1.0, 5.0 * sw / (CASE WHEN n_tokens > 0 THEN n_tokens ELSE 1.0 END))
               ) / 4.0, 6) AS quality
        FROM (
            SELECT doc_id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END AS DOUBLE) AS n_tokens,
                   CAST(length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) AS DOUBLE) AS nonspace,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
                   CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) AS punct,
                   CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a|that|it|for)\\b')) AS DOUBLE) AS sw
            FROM documents
        )
    """,
    "text_lang_id": """
        SELECT doc_id,
               CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
                    WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
                    WHEN de > 0 AND de >= fr THEN 'de'
                    WHEN fr > 0 THEN 'fr'
                    ELSE 'und' END AS lang_pred
        FROM (
            SELECT doc_id,
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a|that|it|for)\\b')) AS en,
                   len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|en|un|por|con|los)\\b')) AS es,
                   len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|von|mit|den|nicht|ein)\\b')) AS de,
                   len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|en|un|du|que|pour)\\b')) AS fr
            FROM documents
        )
    """,
    "text_fingerprint": """
        SELECT doc_id, md5(regexp_replace(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fp
        FROM documents
    """,
    "text_repetition": """
        SELECT doc_id,
               round(CASE WHEN length(trim(text)) = 0 THEN 0.0
                     ELSE 1.0 - CAST(len(list_distinct(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+'))) AS DOUBLE)
                              / CAST(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS DOUBLE)
                     END, 6) AS repetition
        FROM documents
    """,
    "text_pii_redaction": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INTEGER) AS n_ipv4,
               md5(regexp_replace(
                   regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g')) AS redacted_fp
        FROM documents
    """,
    "dedup_ngram_jaccard_allpairs": """
        -- Jaccard over df-capped shingle sets: shingles in more than 5%
        -- of the corpus (the engine's FRACTIONAL stop-shingle rule) are
        -- removed from both sides of the ratio before pairing.
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3
                        THEN list_distinct(list_transform(
                               generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        ELSE [array_to_string(t, ' ')] END AS s
            FROM (SELECT doc_id,
                         string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
                  FROM documents)
        ), shx AS (
            SELECT doc_id, unnest(s) AS shingle FROM base
        ), hot AS (
            SELECT shingle FROM shx GROUP BY shingle
            HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
        ), capped AS (
            SELECT doc_id, list(shingle) AS s
            FROM shx ANTI JOIN hot USING (shingle)
            GROUP BY doc_id
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                         6) AS jaccard
            FROM capped a JOIN capped b ON a.doc_id < b.doc_id
        )
        WHERE jaccard >= 0.5
    """,
    "dedup_ngram_jaccard": """
        -- the LSH rerank's ground truth: at jaccard >= 0.8 the 16x4
        -- banding collides with probability ~1 - 3e-4 per pair, so the
        -- reranked candidate set equals the capped all-pairs set at 0.8
        -- (verified at every test sf; banding recall property-tested)
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3
                        THEN list_distinct(list_transform(
                               generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        ELSE [array_to_string(t, ' ')] END AS s
            FROM (SELECT doc_id,
                         string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
                  FROM documents)
        ), shx AS (
            SELECT doc_id, unnest(s) AS shingle FROM base
        ), hot AS (
            SELECT shingle FROM shx GROUP BY shingle
            HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
        ), capped AS (
            SELECT doc_id, list(shingle) AS s
            FROM shx ANTI JOIN hot USING (shingle)
            GROUP BY doc_id
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                         6) AS jaccard
            FROM capped a JOIN capped b ON a.doc_id < b.doc_id
        )
        WHERE jaccard >= 0.8
    """,
    "dedup_clusters": """
        WITH RECURSIVE base AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3
                        THEN list_distinct(list_transform(
                               generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        ELSE [array_to_string(t, ' ')] END AS s
            FROM (SELECT doc_id,
                         string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
                  FROM documents)
        ), shx AS (
            SELECT doc_id, unnest(s) AS shingle FROM base
        ), hot AS (
            -- the engine's fractional stop-shingle rule (df > 5%)
            SELECT shingle FROM shx GROUP BY shingle
            HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
        ), sh AS (
            SELECT doc_id, list(shingle) AS s
            FROM shx ANTI JOIN hot USING (shingle)
            GROUP BY doc_id
        ), pairs AS (
            SELECT id_a, id_b FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       round(len(list_intersect(a.s, b.s))::DOUBLE
                             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                             6) AS jaccard
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            ) WHERE jaccard >= 0.7
        ), edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ), reach(src, dst) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
        )
        SELECT src AS doc_id,
               least(src, min(dst)) AS component,
               (src = least(src, min(dst))) AS keep
        FROM reach
        GROUP BY src
    """,
    "embedding_cosine_scores": """
        SELECT vec_id, round(CASE WHEN den > 0 THEN num / den ELSE 0.0 END, 6) AS cos_sim
        FROM (
            SELECT e.vec_id,
                   list_dot_product(e.embedding::DOUBLE[], q.q) AS num,
                   sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(q.q, q.q)) AS den
            FROM embeddings e
            CROSS JOIN (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0) q
        )
    """,
    "embedding_topk": """
        SELECT vec_id, round(cos_raw, 6) AS cos_sim
        FROM (
            SELECT vec_id, CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS cos_raw
            FROM (
                SELECT e.vec_id,
                       list_dot_product(e.embedding::DOUBLE[], q.q) AS num,
                       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                         * sqrt(list_dot_product(q.q, q.q)) AS den
                FROM embeddings e
                CROSS JOIN (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0) q
            )
        )
        ORDER BY cos_raw DESC, vec_id
        LIMIT 20
    """,
    "graph_edges": """
        SELECT user_id AS src_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst_id,
               event_type AS rel_type
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
    "graph_nodes": """
        SELECT user_id AS node_id FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        UNION
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS node_id FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
    "graph_degrees": """
        WITH edges AS (
            SELECT user_id AS src_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst_id
            FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        ), outd AS (
            SELECT src_id AS node_id, count(*) AS out_degree FROM edges GROUP BY src_id
        ), ind AS (
            SELECT dst_id AS node_id, count(*) AS in_degree FROM edges GROUP BY dst_id
        )
        SELECT COALESCE(outd.node_id, ind.node_id) AS node_id,
               COALESCE(out_degree, 0) AS out_degree,
               COALESCE(in_degree, 0) AS in_degree
        FROM outd FULL OUTER JOIN ind ON outd.node_id = ind.node_id
    """,
    "sample_docs_hash": f"""
        SELECT doc_id, lang FROM documents
        WHERE {smp.hash_hex_sql(['doc_id'], 'sample')} < '{smp.threshold_hex(0.1)}'
    """,
    "train_val_test_counts": f"""
        SELECT {smp.split_case_sql(['doc_id'], _SPLIT_WEIGHTS, 'split')} AS split,
               count(*) AS n_docs
        FROM documents
        GROUP BY split
    """,
    "stratified_sample_by_lang": f"""
        -- fraction >= 1.0 strata keep EVERYTHING (mirrors the engine's
        -- short-circuit: the strict < 'ffffffff' form deterministically
        -- drops hash-boundary rows from keep-all strata)
        SELECT doc_id, lang FROM documents
        WHERE CASE lang
                {' '.join(f"WHEN '{v}' THEN " + ("TRUE" if fr >= 1.0 else f"{smp.hash_hex_sql(['doc_id'], 'stratified')} < '{smp.threshold_hex(fr)}'") for v, fr in _STRAT_FRACTIONS.items())}
                ELSE FALSE END
    """,
    "domain_capped_sample": f"""
        SELECT doc_id, source, lang FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY source
            ORDER BY {smp.hash_hex_sql(['doc_id'], 'cap')}, doc_id
        ) <= 15
    """,
    # the shingle CTE below mirrors operators.dedup._shingle_stream exactly:
    # tokens = whitespace-split of trim(lower(text)); complete 3-grams, or
    # one whole-text shingle for documents shorter than 3 tokens
    "contamination_vs_benchmark": """
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS l FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                        ELSE list_transform(range(1, len(l) - 1),
                                            i -> array_to_string(l[i:i+2], ' '))
                   END AS shingles
            FROM toks
        ), shingle_rows AS (
            SELECT DISTINCT doc_id, shingle
            FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
        ), bench AS (
            SELECT DISTINCT shingle FROM shingle_rows WHERE doc_id % 20 = 0
        )
        SELECT c.doc_id,
               count(*) AS n_shingles,
               count(b.shingle) AS n_contaminated,
               round(count(b.shingle) / count(*), 6) AS contamination
        FROM (SELECT * FROM shingle_rows WHERE doc_id % 20 <> 0) c
        LEFT JOIN bench b USING (shingle)
        GROUP BY c.doc_id
    """,
    "tfidf_top_terms": """
        WITH terms AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM terms WHERE term <> '' GROUP BY doc_id, term
        ), dfreq AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * ln(n.n_docs / dfreq.df), 4) AS tfidf
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS INTEGER) AS rnk
        FROM scored
        QUALIFY rnk <= 3
    """,
    "top_trigrams": """
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS l FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                        ELSE list_transform(range(1, len(l) - 1),
                                            i -> array_to_string(l[i:i+2], ' '))
                   END AS shingles
            FROM toks
        ), shingle_rows AS (
            SELECT doc_id, unnest(shingles) AS shingle FROM sh
        )
        SELECT shingle,
               count(*) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM shingle_rows
        GROUP BY shingle
        ORDER BY n_occurrences DESC, shingle
        LIMIT 20
    """,
    "token_count_histogram": """
        SELECT least(CAST(floor(n_tokens / 10) * 10 AS BIGINT), 200) AS bucket,
               count(*) AS n_docs
        FROM (
            SELECT CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END AS n_tokens
            FROM documents
        )
        GROUP BY bucket
    """,
    "lang_mixing_weights": """
        WITH counts AS (
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        )
        SELECT lang, n_docs,
               round(n_docs / sum(n_docs) OVER (), 6) AS share,
               round(sum(n_docs) OVER () / (count(*) OVER () * n_docs), 6) AS weight
        FROM counts
    """,
    "lang_mixing_temperature": """
        WITH counts AS (
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ), shares AS (
            SELECT lang, n_docs,
                   n_docs / sum(n_docs) OVER () AS p,
                   pow(n_docs / sum(n_docs) OVER (), 0.3) AS pa
            FROM counts
        )
        SELECT lang, n_docs,
               round(p, 6) AS share,
               round(pa / sum(pa) OVER (), 6) AS temp_share,
               round((pa / sum(pa) OVER ()) / p, 6) AS sample_weight
        FROM shares
    """,
    "text_gopher_repetition": """
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
            FROM documents
        ), bi AS (
            SELECT doc_id, unnest(s) AS g FROM (
                SELECT doc_id,
                       CASE WHEN len(t) >= 2
                            THEN list_transform(
                                   generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])
                            ELSE [array_to_string(t, ' ')] END AS s
                FROM words)
        ), bc AS (
            SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g
        ), bstat AS (
            SELECT doc_id, max(c) AS b_top, sum(c) AS b_n FROM bc GROUP BY doc_id
        ), tri AS (
            SELECT doc_id, unnest(s) AS g FROM (
                SELECT doc_id,
                       CASE WHEN len(t) >= 3
                            THEN list_transform(
                                   generate_series(1, len(t) - 2),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                            ELSE [array_to_string(t, ' ')] END AS s
                FROM words)
        ), tc AS (
            SELECT doc_id, g, count(*) AS c FROM tri GROUP BY doc_id, g
        ), tstat AS (
            SELECT doc_id,
                   sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS t_dup,
                   sum(c) AS t_n
            FROM tc GROUP BY doc_id
        )
        SELECT b.doc_id,
               round(b_top / b_n::DOUBLE, 6) AS top_bigram_frac,
               round(t_dup / t_n::DOUBLE, 6) AS dup_trigram_frac,
               (round(b_top / b_n::DOUBLE, 6) <= 0.20
                AND round(t_dup / t_n::DOUBLE, 6) <= 0.30) AS repetition_ok
        FROM bstat b JOIN tstat USING (doc_id)
    """,
    "quality_filter_funnel": """
        WITH feats AS (
            SELECT length(trim(text)) > 0 AS nonempty,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END AS DOUBLE) AS n_tokens,
                   CAST(length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) AS DOUBLE) AS nonspace,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
                   CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) AS punct,
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a|that|it|for)\\b')) AS en,
                   len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|en|un|por|con|los)\\b')) AS es,
                   len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|von|mit|den|nicht|ein)\\b')) AS de,
                   len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|en|un|du|que|pour)\\b')) AS fr
            FROM documents
        ), gates AS (
            SELECT nonempty,
                   nonempty AND n_tokens >= 10 AS min_tok,
                   round((
                     least(1.0, n_tokens / 20.0)
                     + alpha / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END)
                     + (1.0 - punct / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END))
                     + least(1.0, 5.0 * CAST(en AS DOUBLE) / (CASE WHEN n_tokens > 0 THEN n_tokens ELSE 1.0 END))
                   ) / 4.0, 6) AS quality,
                   (en > 0 AND en >= es AND en >= de AND en >= fr) AS is_en
            FROM feats
        )
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN nonempty THEN 1 ELSE 0 END) AS BIGINT) AS n_nonempty,
               CAST(sum(CASE WHEN min_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_min_tokens,
               CAST(sum(CASE WHEN min_tok AND quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
               CAST(sum(CASE WHEN min_tok AND quality >= 0.5 AND is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_english
        FROM gates
    """,
    "embedding_norm_stats": """
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vectors,
               round(avg(nrm), 4) AS avg_norm,
               round(min(nrm), 4) AS min_norm,
               round(max(nrm), 4) AS max_norm
        FROM (
            SELECT label,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM embeddings
        )
        GROUP BY label
    """,
}


def _pretrain_curated_cte() -> str:
    """Oracle CTE chain replicating plans.pretrain.pretrain_pipeline stage
    by stage; every fragment is the already-proven oracle twin of the
    operator it mirrors (token count / quality / fingerprint / shingles /
    md5 sampling thresholds)."""
    from .pretrain import DEFAULT_SPLIT_WEIGHTS, DEFAULT_STRAT_FRACTIONS

    # fraction >= 1.0 strata keep everything (the engine's short-circuit)
    strat_arms = " ".join(
        "WHEN '%s' THEN %s"
        % (
            v,
            "TRUE"
            if fr >= 1.0
            else "%s < '%s'"
            % (smp.hash_hex_sql(["doc_id"], "pretrain-mix"), smp.threshold_hex(fr)),
        )
        for v, fr in DEFAULT_STRAT_FRACTIONS.items()
    )
    return f"""
        WITH f0 AS (
            SELECT doc_id, lang, text,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END AS INTEGER) AS n_tokens,
                   CAST(length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) AS DOUBLE) AS nonspace,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
                   CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct,
                   CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a|that|it|for)\\b')) AS DOUBLE) AS sw,
                   md5(regexp_replace(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fp
            FROM documents
            WHERE doc_id % 20 <> 0
        ), feats AS (
            SELECT doc_id, lang, text, n_tokens, fp,
                   round((
                     least(1.0, CAST(n_tokens AS DOUBLE) / 20.0)
                     + alpha / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END)
                     + (1.0 - punct / (CASE WHEN nonspace > 0 THEN nonspace ELSE 1.0 END))
                     + least(1.0, 5.0 * sw / (CASE WHEN n_tokens > 0 THEN CAST(n_tokens AS DOUBLE) ELSE 1.0 END))
                   ) / 4.0, 6) AS quality
            FROM f0
        ), gated AS (
            SELECT * FROM feats
            WHERE length(trim(text)) > 0 AND n_tokens >= 5 AND quality >= 0.3
        ), deduped AS (
            SELECT * FROM gated
            QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
        ), ctoks AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS l FROM deduped
        ), csh AS (
            SELECT doc_id,
                   CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                        ELSE list_transform(range(1, len(l) - 1),
                                            i -> array_to_string(l[i:i+2], ' '))
                   END AS shingles
            FROM ctoks
        ), corpus_sh AS (
            SELECT DISTINCT doc_id, shingle
            FROM (SELECT doc_id, unnest(shingles) AS shingle FROM csh)
        ), btoks AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS l
            FROM documents WHERE doc_id % 20 = 0
        ), bsh AS (
            SELECT doc_id,
                   CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                        ELSE list_transform(range(1, len(l) - 1),
                                            i -> array_to_string(l[i:i+2], ' '))
                   END AS shingles
            FROM btoks
        ), bench_sh AS (
            SELECT DISTINCT shingle FROM (SELECT unnest(shingles) AS shingle FROM bsh)
        ), contam AS (
            SELECT c.doc_id, round(count(b.shingle) / count(*), 6) AS contamination
            FROM corpus_sh c LEFT JOIN bench_sh b USING (shingle)
            GROUP BY c.doc_id
        ), decont AS (
            SELECT d.doc_id, d.lang, d.n_tokens, d.quality,
                   COALESCE(ct.contamination, 0.0) AS contamination
            FROM deduped d LEFT JOIN contam ct USING (doc_id)
            WHERE COALESCE(ct.contamination, 0.0) <= 0.5
        ), curated AS (
            SELECT doc_id, lang, n_tokens, quality, contamination,
                   {smp.split_case_sql(['doc_id'], DEFAULT_SPLIT_WEIGHTS, 'pretrain-split')} AS split
            FROM decont
            WHERE CASE lang {strat_arms} ELSE FALSE END
        )
    """


ORACLE_SQL["pretrain_curated_docs"] = (
    _pretrain_curated_cte()
    + """
        SELECT doc_id, lang, n_tokens, quality, contamination, split FROM curated
    """
)

ORACLE_SQL["pretrain_corpus_summary"] = (
    _pretrain_curated_cte()
    + """
        SELECT split, lang,
               count(*) AS n_docs,
               sum(n_tokens) AS n_tokens,
               round(avg(quality), 4) AS avg_quality
        FROM curated
        GROUP BY split, lang
    """
)

ORACLE_SQL["passage_dedup_docs"] = """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS w
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
               array_to_string(w[(i*10+1):(i*10+10)], ' ') AS chunk
        FROM words, UNNEST(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS t(i)
    ),
    ranked AS (
        SELECT doc_id, chunk_idx, chunk,
               row_number() OVER (PARTITION BY chunk
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
           md5(COALESCE(string_agg(
               CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY chunk_idx), ''))
               AS kept_text_md5
    FROM ranked
    GROUP BY doc_id
"""

ORACLE_SQL["doc_novelty"] = """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
        FROM documents
    ),
    d AS (
        SELECT doc_id, unnest(s) AS shingle FROM (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3
                        THEN list_distinct(list_transform(
                               generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        ELSE [array_to_string(t, ' ')] END AS s
            FROM words)
    ),
    firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM d GROUP BY shingle)
    SELECT d.doc_id, count(*) AS n_shingles,
           round(avg(CASE WHEN d.doc_id = f.first_doc THEN 1.0 ELSE 0.0 END), 4) AS novelty
    FROM d JOIN firsts f USING (shingle)
    GROUP BY d.doc_id
"""

ORACLE_SQL["q15_top_supplier"] = """
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""

ORACLE_SQL["orders_export_sorted"] = """
    SELECT CAST(o_orderdate AS DATE) AS o_orderdate, o_orderkey, o_custkey,
           round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    ORDER BY o_orderdate, o_orderkey
"""

ORACLE_SQL["sliding_event_counts"] = """
    WITH base AS (
        SELECT event_type, value,
               (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 AS anchor
        FROM events
    ), expanded AS (
        SELECT event_type, value, anchor - i * 600 AS window_start
        FROM base, unnest([0, 1, 2]) u(i)
    )
    SELECT window_start, event_type, count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM expanded GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["event_transition_matrix"] = """
    WITH seq AS (
        SELECT user_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               event_type AS next_type
        FROM events
    )
    SELECT prev_type, next_type, count(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["copurchase_part_pairs"] = """
    WITH pairs AS (
        SELECT DISTINCT x.l_orderkey,
               x.l_partkey AS part_a, y.l_partkey AS part_b
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    )
    SELECT part_a, part_b, count(*) AS n_orders
    FROM pairs GROUP BY 1, 2
    HAVING count(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
"""

ORACLE_SQL["event_funnel_steps"] = """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    )
    SELECT 1 AS step_order, 'view' AS step, count(*) AS n_users,
           sum(CAST(floor(epoch(t1)) AS BIGINT)) AS step_ts_checksum FROM s1
    UNION ALL
    SELECT 2, 'click', count(*),
           sum(CAST(floor(epoch(t2)) AS BIGINT)) FROM s2
    UNION ALL
    SELECT 3, 'purchase', count(*),
           sum(CAST(floor(epoch(t3)) AS BIGINT)) FROM s3
    ORDER BY step_order
"""

ORACLE_SQL["cohort_retention"] = """
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week_idx
        FROM events
    ),
    f AS (SELECT user_id, min(week_idx) AS cohort_week FROM uw GROUP BY user_id)
    SELECT f.cohort_week, uw.week_idx - f.cohort_week AS week_offset,
           count(*) AS active_users
    FROM uw JOIN f USING (user_id)
    GROUP BY 1, 2
"""

ORACLE_SQL["unigram_logprob_score"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
        FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT sum(c) AS n FROM freq)
    SELECT t.doc_id, count(*) AS n_tokens,
           round(avg(-ln(f.c / tot.n)), 4) AS avg_neg_logprob
    FROM tok t JOIN freq f USING (tok) CROSS JOIN tot
    GROUP BY t.doc_id
"""

ORACLE_SQL["q12_priority_shipping"] = """
    SELECT CAST(quarter(CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_quarter,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ship_quarter
"""

ORACLE_SQL["balance_distribution_by_segment"] = """
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
           round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6)
               AS bal_percent_rank,
           round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6)
               AS bal_cume_dist
    FROM customer
"""

ORACLE_SQL["user_first_last_event"] = """
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_event_type,
           last_value(event_type) OVER w AS last_event_type,
           count(*) OVER w AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

ORACLE_SQL["multimodal_features"] = """
    SELECT doc_id AS media_id,
           'text/plain' AS mime_type,
           CAST(COALESCE(octet_length(CAST(text AS BLOB)), 0) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha256,
           array_to_string(
             list_transform(range(8), i ->
               printf('%.4f',
                 CAST(CAST(
                   (strpos('0123456789abcdef', substr(sha256(text), 1 + 2*i, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(sha256(text), 2 + 2*i, 1)) - 1)
                 AS DOUBLE) / 255.0 AS REAL))),
             ',') AS feature_r4
    FROM documents
"""

ORACLE_SQL["pack_training_sequences"] = """
    WITH toks AS (
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) END
                    AS INTEGER) AS n_tokens
        FROM documents
    ),
    offs AS (
        SELECT doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                    AS BIGINT) AS "offset"
        FROM toks
    )
    SELECT doc_id, n_tokens, "offset",
           CAST(floor("offset" / 512.0) AS BIGINT) AS first_seq,
           CAST(floor(("offset" + greatest(n_tokens, 1) - 1) / 512.0) AS BIGINT) AS last_seq,
           CAST(floor(("offset" + greatest(n_tokens, 1) - 1) / 512.0)
                - floor("offset" / 512.0) + 1 AS BIGINT) AS n_seqs
    FROM offs
"""

ORACLE_SQL["table_profile_orders"] = """
    WITH w AS (
        SELECT
            sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS k_nulls,
            count(DISTINCT o_orderkey) AS k_distinct,
            CAST(min(o_orderkey) AS VARCHAR) AS k_min,
            CAST(max(o_orderkey) AS VARCHAR) AS k_max,
            sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS c_nulls,
            count(DISTINCT o_custkey) AS c_distinct,
            CAST(min(o_custkey) AS VARCHAR) AS c_min,
            CAST(max(o_custkey) AS VARCHAR) AS c_max,
            sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS s_nulls,
            count(DISTINCT o_orderstatus) AS s_distinct,
            CAST(min(o_orderstatus) AS VARCHAR) AS s_min,
            CAST(max(o_orderstatus) AS VARCHAR) AS s_max,
            sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS t_nulls,
            count(DISTINCT o_totalprice) AS t_distinct,
            printf('%.2f', min(o_totalprice)) AS t_min,
            printf('%.2f', max(o_totalprice)) AS t_max,
            sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS p_nulls,
            count(DISTINCT o_orderpriority) AS p_distinct,
            CAST(min(o_orderpriority) AS VARCHAR) AS p_min,
            CAST(max(o_orderpriority) AS VARCHAR) AS p_max
        FROM orders
    )
    SELECT 'o_orderkey' AS column_name, CAST(k_nulls AS BIGINT) AS n_nulls,
           CAST(k_distinct AS BIGINT) AS n_distinct, k_min AS min_value, k_max AS max_value FROM w
    UNION ALL
    SELECT 'o_custkey', CAST(c_nulls AS BIGINT), CAST(c_distinct AS BIGINT), c_min, c_max FROM w
    UNION ALL
    SELECT 'o_orderstatus', CAST(s_nulls AS BIGINT), CAST(s_distinct AS BIGINT), s_min, s_max FROM w
    UNION ALL
    SELECT 'o_totalprice', CAST(t_nulls AS BIGINT), CAST(t_distinct AS BIGINT), t_min, t_max FROM w
    UNION ALL
    SELECT 'o_orderpriority', CAST(p_nulls AS BIGINT), CAST(p_distinct AS BIGINT), p_min, p_max FROM w
"""

ORACLE_SQL["embedding_dedup_clusters"] = """
    WITH RECURSIVE pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS c
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE c >= 0.4
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(src, dst) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    )
    SELECT src AS vec_id,
           least(src, min(dst)) AS component,
           (src = least(src, min(dst))) AS keep
    FROM reach
    GROUP BY src
"""

ORACLE_SQL["contrastive_triplets"] = """
    WITH base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT doc_id, unnest(s) AS shingle FROM base
    ), hot AS (
        SELECT shingle FROM shx GROUP BY shingle
        HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
    ), capped AS (
        SELECT doc_id, list(shingle) AS s
        FROM shx ANTI JOIN hot USING (shingle)
        GROUP BY doc_id
    ), pairs AS (
        SELECT id_a AS anchor, id_b AS positive FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                         6) AS jaccard
            FROM capped a JOIN capped b ON a.doc_id < b.doc_id
        )
        WHERE jaccard >= 0.5
    ), ranked AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id) - 1 AS rnk,
               count(*) OVER () AS n_total
        FROM documents
    ), anchors AS (
        SELECT doc_id, rnk, n_total, unnest(generate_series(0, 1)) AS neg_idx
        FROM ranked
    ), targets AS (
        SELECT doc_id, neg_idx,
               (rnk + 1 + (CAST(concat('0x', substr(md5(
                    'neg:' || CAST(rnk AS VARCHAR) || ':' || CAST(neg_idx AS VARCHAR)
                ), 1, 8)) AS BIGINT) % (n_total - 1))) % n_total AS tr
        FROM anchors
    ), negs AS (
        SELECT t.doc_id AS anchor, t.neg_idx, r.doc_id AS negative
        FROM targets t JOIN ranked r ON r.rnk = t.tr
    )
    SELECT anchor, positive, neg_idx, negative
    FROM pairs JOIN negs USING (anchor)
    WHERE negative != positive
"""

ORACLE_SQL["contrastive_negative_samples"] = """
    WITH ranked AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id) - 1 AS rnk,
               count(*) OVER () AS n_total
        FROM documents
    ), anchors AS (
        SELECT doc_id, rnk, n_total, unnest(generate_series(0, 3)) AS neg_idx
        FROM ranked
    ), targets AS (
        SELECT doc_id, neg_idx,
               (rnk + 1 + (CAST(concat('0x', substr(md5(
                    'neg:' || CAST(rnk AS VARCHAR) || ':' || CAST(neg_idx AS VARCHAR)
                ), 1, 8)) AS BIGINT) % (n_total - 1))) % n_total AS tr
        FROM anchors
    )
    SELECT t.doc_id, t.neg_idx, r.doc_id AS neg_doc_id
    FROM targets t JOIN ranked r ON r.rnk = t.tr
"""

ORACLE_SQL["lang_label_confusion"] = """
    SELECT lang AS declared,
           CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
                WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
                WHEN de > 0 AND de >= fr THEN 'de'
                WHEN fr > 0 THEN 'fr'
                ELSE 'und' END AS predicted,
           count(*) AS n_docs
    FROM (
        SELECT lang,
               len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a|that|it|for)\\b')) AS en,
               len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|en|un|por|con|los)\\b')) AS es,
               len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|von|mit|den|nicht|ein)\\b')) AS de,
               len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|en|un|du|que|pour)\\b')) AS fr
        FROM documents
    )
    GROUP BY declared, predicted
"""

# ONE oracle-side definition of the capped near-dup pair scan (trigram
# shingles, fractional df-cap 0.05, exact Jaccard >= 0.5) and of the
# component closure over it — composed into every 0.5-threshold twin
# below exactly the way the Spark side shares dd.jaccard_all_pairs /
# _near_dup_components, so the cluster definition cannot silently
# de-synchronize between oracles either.
_ORACLE_CAPPED_PAIRS_05 = """base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT doc_id, unnest(s) AS shingle FROM base
    ), hot AS (
        SELECT shingle FROM shx GROUP BY shingle
        HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
    ), capped AS (
        SELECT doc_id, list(shingle) AS s
        FROM shx ANTI JOIN hot USING (shingle)
        GROUP BY doc_id
    ), pairs AS (
        SELECT id_a, id_b, jaccard FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                         6) AS jaccard
            FROM capped a JOIN capped b ON a.doc_id < b.doc_id
        )
        WHERE jaccard >= 0.5
    )"""

_ORACLE_COMPONENT_CTES = """edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(src, dst) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ), comp AS (
        SELECT src AS doc_id, least(src, min(dst)) AS component
        FROM reach GROUP BY src
    )"""

ORACLE_SQL["source_near_dup_matrix"] = f"""
    WITH {_ORACLE_CAPPED_PAIRS_05}
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_pairs,
           round(avg(jaccard), 6) AS avg_jaccard
    FROM pairs
    JOIN documents da ON da.doc_id = id_a
    JOIN documents db ON db.doc_id = id_b
    GROUP BY source_a, source_b
"""

ORACLE_SQL["length_curriculum_buckets"] = """
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+'))
               END AS n_tokens
        FROM documents
    ), ranked AS (
        SELECT n_tokens,
               row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS rnk,
               count(*) OVER () AS n_total
        FROM toks
    )
    SELECT (rnk * 8) // n_total + 1 AS bucket,
           count(*) AS n_docs,
           min(n_tokens) AS min_tokens,
           max(n_tokens) AS max_tokens,
           round(avg(n_tokens), 4) AS avg_tokens
    FROM ranked
    GROUP BY bucket
"""

ORACLE_SQL["split_leakage_pairs"] = f"""
    WITH {_ORACLE_CAPPED_PAIRS_05}, splits AS (
        SELECT doc_id,
               {smp.split_case_sql(["doc_id"], _SPLIT_WEIGHTS, "split")} AS split
        FROM documents
    )
    SELECT id_a, id_b, jaccard, sa.split AS split_a, sb.split AS split_b
    FROM pairs
    JOIN splits sa ON sa.doc_id = id_a
    JOIN splits sb ON sb.doc_id = id_b
    WHERE sa.split != sb.split
"""

ORACLE_SQL["split_cluster_safe"] = f"""
    WITH RECURSIVE {_ORACLE_CAPPED_PAIRS_05}, {_ORACLE_COMPONENT_CTES}, keyed AS (
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS split_key
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    )
    SELECT doc_id, split_key,
           {smp.split_case_sql(["split_key"], _SPLIT_WEIGHTS, "split")} AS split
    FROM keyed
"""

ORACLE_SQL["soft_dedup_weights"] = f"""
    WITH RECURSIVE {_ORACLE_CAPPED_PAIRS_05}, {_ORACLE_COMPONENT_CTES}, sizes AS (
        SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
    )
    SELECT d.doc_id,
           coalesce(s.cluster_size, 1) AS cluster_size,
           round(1.0 / coalesce(s.cluster_size, 1), 6) AS weight
    FROM documents d
    LEFT JOIN comp c ON d.doc_id = c.doc_id
    LEFT JOIN sizes s ON c.component = s.component
"""

ORACLE_SQL["rag_passage_windows"] = """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
        FROM documents
    ), starts AS (
        SELECT doc_id, t,
               unnest(generate_series(
                   0,
                   (CAST(greatest(ceil((len(t) - 32) / 24.0) + 1, 1) AS INTEGER) - 1) * 24,
                   24)) AS s
        FROM words
    )
    SELECT doc_id,
           CAST(s / 24 AS INTEGER) AS passage_idx,
           array_to_string(t[s+1:s+32], ' ') AS passage,
           CAST(least(32, len(t) - s) AS INTEGER) AS n_tokens
    FROM starts
"""

ORACLE_SQL["dsir_importance_weights"] = """
    WITH src AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
        FROM documents WHERE doc_id % 20 != 0
    ), tgt AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
        FROM documents WHERE doc_id % 20 = 0
    ), sc AS (
        SELECT tok, count(*) AS ns FROM src GROUP BY tok
    ), tc AS (
        SELECT tok, count(*) AS nt FROM tgt GROUP BY tok
    ), stats AS (
        SELECT tok, COALESCE(ns, 0) AS ns, COALESCE(nt, 0) AS nt
        FROM sc FULL OUTER JOIN tc USING (tok)
    ), tot AS (
        SELECT CAST(sum(ns) AS DOUBLE) AS tot_s,
               CAST(sum(nt) AS DOUBLE) AS tot_t,
               CAST(count(*) AS DOUBLE) AS vocab
        FROM stats
    )
    SELECT doc_id, count(*) AS n_tokens,
           -- + 0.0 normalizes IEEE -0.0 (see dsir_log_weights)
           round(sum(
               ln((nt + 0.5) / (tot_t + 0.5 * vocab))
               - ln((ns + 0.5) / (tot_s + 0.5 * vocab))
           ), 4) + 0.0 AS log_weight
    FROM src JOIN stats USING (tok) CROSS JOIN tot
    GROUP BY doc_id
"""

ORACLE_SQL["text_substring_dup_stats"] = """
    -- positional 10-gram stream with the engine's short-doc contract:
    -- for len < 10 the single window is the whole text (the slice
    -- t[i:i+9] truncates to available tokens, so one formula covers
    -- both); a position is duplicated when its gram occurs > 1 time
    -- corpus-wide; runs decompose via the pos - row_number gap trick
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
        FROM documents
    ), pos AS (
        SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+9], ' ') AS g
        FROM words,
             unnest(generate_series(1, greatest(len(t) - 9, 1))) AS u(i)
    ), occ AS (
        SELECT g, count(*) AS n FROM pos GROUP BY g
    ), marked AS (
        SELECT doc_id, pos, (n > 1) AS dup
        FROM pos JOIN occ USING (g)
    ), runs AS (
        SELECT doc_id, dup,
               pos - row_number() OVER (
                   PARTITION BY doc_id, dup ORDER BY pos) AS grp
        FROM marked
    ), per_run AS (
        SELECT doc_id, dup, grp, count(*) AS run_len
        FROM runs GROUP BY doc_id, dup, grp
    ), run_stats AS (
        SELECT doc_id,
               CAST(max(CASE WHEN dup THEN run_len ELSE 0 END) AS BIGINT)
                   AS max_dup_run
        FROM per_run GROUP BY doc_id
    ), doc_stats AS (
        SELECT doc_id, count(*) AS n_grams,
               CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_grams
        FROM marked GROUP BY doc_id
    )
    SELECT doc_id, n_grams, dup_grams,
           round(dup_grams / n_grams::DOUBLE, 6) AS dup_fraction,
           max_dup_run
    FROM doc_stats JOIN run_stats USING (doc_id)
"""

ORACLE_SQL["dedup_simhash"] = """
    -- full SimHash recomputation: md5-derived signed-64 token hashes,
    -- per-bit majority votes, packed signature, exact hamming pairs.
    -- (The engine's pigeonhole blocking is exact for hamming <= 3, so
    -- the all-pairs form here defines the same output set.)
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(
                   string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+'))) AS tok
        FROM documents
    ), h AS (
        SELECT doc_id,
               (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
                 * 4294967296 + lo AS h
        FROM (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS hi,
                   CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT) AS lo
            FROM toks)
    ), bits AS (
        SELECT doc_id, b,
               sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM h CROSS JOIN range(0, 64) t(b)
        GROUP BY doc_id, b
    ), sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN
                   CASE WHEN b = 63 THEN -9223372036854775808
                        ELSE (1::BIGINT << b) END
                 ELSE 0 END) AS BIGINT) AS sh
        FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""

ORACLE_SQL["embedding_knn_join"] = """
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 5
    ), scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_dot_product(e.embedding::DOUBLE[], q.qv) AS num,
               sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                 * sqrt(list_dot_product(q.qv, q.qv)) AS den
        FROM embeddings e CROSS JOIN q
    ), ranked AS (
        SELECT query_id, neighbor_id,
               CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS c,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY CASE WHEN den > 0 THEN num / den ELSE 0.0 END DESC,
                            neighbor_id
               ) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, round(c, 6) AS cos_sim, rnk
    FROM ranked WHERE rnk <= 10
"""

ORACLE_SQL["embedding_dedup_clusters_lsh"] = """
    -- the adaptive dispatch runs the exact blocked scan below its corpus
    -- crossover, so at test scales the output is the deterministic exact
    -- pair set at threshold 0.5 -> same closure oracle as
    -- embedding_dedup_clusters
    WITH RECURSIVE pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS c
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE c >= 0.5
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(src, dst) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    )
    SELECT src AS vec_id,
           least(src, min(dst)) AS component,
           (src = least(src, min(dst))) AS keep
    FROM reach
    GROUP BY src
"""

ORACLE_SQL["events_interval_pairs"] = """
    SELECT a.user_id, count(*) AS n_pairs
    FROM events a JOIN events b ON a.user_id = b.user_id
      AND epoch_us(b.ts) > epoch_us(a.ts)
      AND epoch_us(b.ts) - epoch_us(a.ts) <= 600 * 1000000
    GROUP BY a.user_id
"""

ORACLE_SQL["weighted_sample_docs"] = """
    SELECT doc_id, lang, source, n_chars FROM (
        SELECT doc_id, lang, source, n_chars,
               -ln((CAST(concat('0x', substr(md5('wdocs' || ':' ||
                        CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
                   / 4294967296.0)
               / CAST(n_chars AS DOUBLE) AS score
        FROM documents
        WHERE CAST(n_chars AS DOUBLE) > 0
        ORDER BY score ASC, doc_id
        LIMIT 50
    )
"""

ORACLE_SQL["sketch_order_stats"] = """
    -- exact twin of the group/count columns; the sketch columns are
    -- error-bound predicates the engine must satisfy (TRUE here), so the
    -- hash compare checks the sketch CONTRACT, not engine-internal values
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_buyers,
           TRUE AS hll_within_bound,
           TRUE AS p50_within_bound,
           TRUE AS p95_within_bound
    FROM orders
    GROUP BY o_orderstatus
"""

ORACLE_SQL["boilerplate_chunk_removal"] = """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS w
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
               array_to_string(w[(i*10+1):(i*10+10)], ' ') AS chunk
        FROM words, UNNEST(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS t(i)
    ),
    hot AS (
        SELECT chunk FROM chunks GROUP BY chunk
        HAVING count(DISTINCT doc_id) > 2
    ),
    marked AS (
        SELECT c.doc_id, c.chunk_idx, c.chunk,
               (h.chunk IS NOT NULL) AS is_hot
        FROM chunks c LEFT JOIN hot h ON c.chunk = h.chunk
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN NOT is_hot THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_chunks,
           md5(COALESCE(string_agg(
               CASE WHEN NOT is_hot THEN chunk END, ' ' ORDER BY chunk_idx), ''))
               AS kept_text_md5
    FROM marked
    GROUP BY doc_id
"""

ORACLE_SQL["epoch_shuffle_docs"] = f"""
    SELECT doc_id,
           {smp.hash_hex_sql(['doc_id'], 'epoch-1')} AS sort_key
    FROM documents
    ORDER BY sort_key, doc_id
"""

ORACLE_SQL["bigram_logprob_score"] = """
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS w
        FROM documents
    ),
    pairs AS (
        SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(w) - 1),
                       i -> {'w1': w[i], 'w2': w[i+1]})) AS b
            FROM t WHERE len(w) >= 2
        )
    ),
    bf AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY w1, w2),
    cf AS (SELECT w1, count(*) AS cc FROM pairs GROUP BY w1)
    SELECT p.doc_id, count(*) AS n_bigrams,
           round(avg(-ln(bf.cb * 1.0 / cf.cc)), 4) AS avg_neg_logprob
    FROM pairs p JOIN bf USING (w1, w2) JOIN cf USING (w1)
    GROUP BY p.doc_id
"""

ORACLE_SQL["dedup_minhash_lsh"] = """
    -- full MinHash/LSH recomputation with the engine-portable member
    -- family: md5(shingle) -> two 32-bit halves (h1, h2); member i =
    -- min((h1 + i*h2) mod (2^31 - 1)) (Kirsch-Mitzenmacher double
    -- hashing). A pair is a candidate iff SOME 4-member band agrees
    -- fully (the engine's band bucket-hash equality, exact up to a
    -- ~2^-64 xxhash64 bucket collision), and est_jaccard is the
    -- 64-member agreement fraction; the >= 0.5 filter is agree >= 32.
    WITH base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT doc_id, unnest(s) AS shingle FROM base
    ), hh AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
               CAST(concat('0x', substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
        FROM shx
    ), mem AS (
        SELECT doc_id, i, min((h1 + i * h2) % 2147483647) AS m
        FROM hh CROSS JOIN range(0, 64) t(i)
        GROUP BY doc_id, i
    ), sig AS (
        SELECT doc_id, list(m ORDER BY i) AS sg FROM mem GROUP BY doc_id
    ), scored AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_filter(range(1, 65), i -> a.sg[i] = b.sg[i])) AS agree,
               len(list_filter(range(0, 16), bb ->
                   a.sg[4*bb+1] = b.sg[4*bb+1] AND a.sg[4*bb+2] = b.sg[4*bb+2]
                   AND a.sg[4*bb+3] = b.sg[4*bb+3] AND a.sg[4*bb+4] = b.sg[4*bb+4]
               )) > 0 AS collide
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, round(agree / 64.0, 6) AS est_jaccard
    FROM scored
    WHERE collide AND agree >= 32
"""

ORACLE_SQL["embedding_semdedup"] = """
    -- the crossover's exact single-cell limit at test scale: exact
    -- cosine pairs >= 0.45 -> transitive closure -> min-id keeper,
    -- identical contract to the engine's cluster-and-keep output
    WITH RECURSIVE pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS c
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE c >= 0.45
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(src, dst) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    )
    SELECT src AS vec_id,
           least(src, min(dst)) AS component,
           (src = least(src, min(dst))) AS keep
    FROM reach
    GROUP BY src
"""
