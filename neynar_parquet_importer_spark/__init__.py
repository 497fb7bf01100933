"""PySpark-native analytics engine with the query/data-processing
capabilities of neynarxyz/neynar_parquet_importer.

The reference (read-only at /root/reference) is a row-at-a-time Python
ETL daemon; this package re-expresses every operator it supports as
idiomatic Spark DataFrame / SQL / Structured Streaming plans, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) that a 100 TB deployment needs.

Layout:
- ``session``    SparkSession factory (UTC, AQE, Arrow on)
- ``catalog``    declared StructType schemas (reference tables + testdata)
- ``filters``    MongoDB-style predicate DSL -> Catalyst ``Column`` compiler
- ``functions``  scalar functions (JSON cleanup incl. python-repr fallback,
                 hex projection, timestamps)
- ``plans``      relational query plans (joins, aggs, windows, set ops)
- ``operators``  dedup / similarity / text-analysis / multimodal operators
- ``sources``    parquet window-file source (filename parsing, listing)
- ``sinks``      recency-guarded upsert (lake + JDBC), import ledger
- ``streaming``  Structured Streaming pipelines (tumbling windows,
                 foreachBatch upsert, watermarks)
- ``graph``      property-graph projection (node/edge DataFrames)
"""

__version__ = "0.1.0"
