"""Keep-up measurement for the reference's operational envelope
(BASELINE.md §A): a v3 table publishes one 1-second window file per
second; the importer must ingest them in <= ~1 s amortized. This drives
run_catchup over a burst of 1-row window files (the reference's own
test-fixture scale: tests/README.md, 1 row / ~4 KB per window) and
bounds the amortized per-window cost loosely enough to never flake,
while printing the measured number for the record."""

from __future__ import annotations

import os
import time

from neynar_parquet_importer_spark.streaming import ImportPipeline

from tests.test_pipeline import SPEC, _row, _write_window

N_WINDOWS = 30
BOUND_S = 2.0  # generous local[32] bound; the envelope target is ~1 s


def test_catchup_keeps_up_with_one_second_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_window(spark, src, 0, 1000, [_row(0, 9, 19, 500)])  # full snapshot
    for i in range(N_WINDOWS):
        _write_window(spark, src, 1000 + i, 1, [_row(i + 1, 10 + i, 20 + i, 1000 + i)])

    pipe = ImportPipeline(
        spark, SPEC, src, str(tmp_path / "lake"), incremental_duration=1
    )
    t0 = time.perf_counter()
    report = pipe.run_catchup(end_timestamp=1000 + N_WINDOWS)
    elapsed = time.perf_counter() - t0

    assert pipe.sink.read().count() == N_WINDOWS + 1
    per_window = elapsed / N_WINDOWS
    print(f"\nkeepup: {N_WINDOWS} windows in {elapsed:.2f}s "
          f"({per_window*1000:.0f} ms/window amortized)")
    assert per_window < BOUND_S, (
        f"amortized {per_window:.2f}s per 1s window exceeds {BOUND_S}s — "
        "the engine no longer keeps up with the reference's v3 envelope"
    )
