from .lake_upsert import LakeUpsertSink
from .ledger import ImportLedger
from .jdbc_upsert import (
    build_upsert_sql,
    chunk_rows_for_param_limit,
    iter_chunks_for_param_limit,
    jdbc_upsert_writer,
    write_partition_rows,
)

__all__ = [
    "LakeUpsertSink",
    "ImportLedger",
    "build_upsert_sql",
    "chunk_rows_for_param_limit",
    "iter_chunks_for_param_limit",
    "jdbc_upsert_writer",
    "write_partition_rows",
]
