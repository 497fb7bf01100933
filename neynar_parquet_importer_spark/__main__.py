"""CLI entry points (reference entry points 3.1-3.3).

    python -m neynar_parquet_importer_spark run            # daemon loop
    python -m neynar_parquet_importer_spark direct-import FILE
    python -m neynar_parquet_importer_spark backfill --start S --end E
    python -m neynar_parquet_importer_spark bootstrap-ddl  # print sink DDL

Configuration is environment-driven (settings.Settings, mirroring the
reference's env file surface): NPE_VERSION picks v2/v3, TABLES selects
tables, LOCAL_INPUT_DIR/SINK_DIR point at the window directory and lake
root. The daemon runs one import loop per selected table over a shared
SparkSession until SIGINT/SIGTERM sets the shutdown event (W9 fencing).
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading

from .settings import Settings


def _build_pipelines(spark, settings: Settings):
    from .streaming import ImportPipeline

    filter_docs = settings.filter_doc() or {}
    return [
        ImportPipeline(
            spark,
            spec,
            settings.local_input_dir,
            settings.sink_dir,
            schema_name=settings.parquet_s3_schema,
            file_version=settings.npe_version,
            incremental_duration=settings.incremental_duration,
            filter_doc=filter_docs.get(name),
        )
        for name, spec in settings.selected_tables().items()
    ]


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="neynar_parquet_importer_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("run", help="continuous per-table import daemon")
    p_direct = sub.add_parser("direct-import", help="import one parquet file")
    p_direct.add_argument("file")
    p_back = sub.add_parser("backfill", help="re-import an updated_at range")
    p_back.add_argument("--start", required=True)
    p_back.add_argument("--end", required=True)
    p_back.add_argument("--end-timestamp", type=int, default=None)
    p_ddl = sub.add_parser("bootstrap-ddl", help="print sink bootstrap DDL")
    p_ddl.add_argument("--schema", default=None)
    args = parser.parse_args(argv)

    settings = Settings().initialize()

    if args.cmd == "bootstrap-ddl":
        # no SparkSession needed: DDL comes straight from the catalog
        from .sinks.ddl import bootstrap_statements

        specs = list(settings.selected_tables().values())
        schema = args.schema or settings.postgres_schema
        for stmt in bootstrap_statements(specs, schema):
            print(stmt + ";")
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"neynar-import-{args.cmd}")

    if args.cmd == "direct-import":
        from .streaming.daemon import direct_import

        report = direct_import(spark, args.file, settings.sink_dir)
        print(report)
        return 0

    if args.cmd == "backfill":
        reports = {}
        for pipe in _build_pipelines(spark, settings):
            reports[pipe.spec.name] = pipe.run_backfill(
                args.start, args.end, end_timestamp=args.end_timestamp
            )
        for name, rep in reports.items():
            print(name, rep)
        return 0

    # run: daemon loop per table until SIGINT/SIGTERM (W9)
    from .streaming.daemon import run_tables_forever

    shutdown = threading.Event()
    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda *_: shutdown.set())
    reports = run_tables_forever(
        _build_pipelines(spark, settings),
        shutdown=shutdown,
        exit_after_max_wait=settings.exit_after_max_wait,
    )
    for name, rep in reports.items():
        print(name, rep)
    return 0


if __name__ == "__main__":
    sys.exit(main())
