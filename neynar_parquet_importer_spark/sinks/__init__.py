from .lake_upsert import LakeUpsertSink
from .ledger import ImportLedger
from .jdbc_upsert import build_upsert_sql, chunk_rows_for_param_limit, jdbc_upsert_writer

__all__ = [
    "LakeUpsertSink",
    "ImportLedger",
    "build_upsert_sql",
    "chunk_rows_for_param_limit",
    "jdbc_upsert_writer",
]
