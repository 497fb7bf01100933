"""Backfill entry point (F9 range + backfill-flagged ledger rows) and
window arrival polling / watchdog / shutdown fencing (W2/W3/W9)."""

from __future__ import annotations

import datetime
import os
import threading

import pytest

from neynar_parquet_importer_spark.streaming import ImportPipeline
from tests.test_pipeline import SPEC, _row, _write_window


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_run_backfill_range_and_flag(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_window(
        spark, src, 0, 100,
        [_row(1, 10, 20, 10), _row(2, 11, 21, 50), _row(3, 12, 22, 90)],
    )
    pipe = ImportPipeline(spark, SPEC, src, str(tmp_path / "lake"), incremental_duration=1)
    report = pipe.run_backfill(_ts(40), _ts(60), end_timestamp=100, now=100)
    assert report.files_imported == 1
    # only the row inside [40, 60] lands (inclusive bounds)
    assert [r.id for r in pipe.sink.read().collect()] == ["id-2"]
    entry = pipe.ledger._entries["nindexer-follows-0-100.parquet"]
    assert entry.backfill and entry.completed


@pytest.fixture()
def poll_pipe(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    return ImportPipeline(spark, SPEC, src, str(tmp_path / "lake"), incremental_duration=10), src


def test_wait_for_window_file_appears(poll_pipe):
    pipe, src = poll_pipe
    clock = {"t": 1000.0}

    def now():
        return clock["t"]

    def sleep(s):
        clock["t"] += s
        if clock["t"] >= 1012:  # file published at ETA+1
            open(os.path.join(src, "nindexer-follows-1000-1010.parquet"), "w").close()

    got = pipe.wait_for_window(1000, now_fn=now, sleep_fn=sleep)
    assert got is not None and got.endswith("nindexer-follows-1000-1010.parquet")


def test_wait_for_window_empty_sentinel(poll_pipe):
    pipe, src = poll_pipe
    open(os.path.join(src, "nindexer-follows-1000-1010.empty"), "w").close()
    got = pipe.wait_for_window(1000, now_fn=lambda: 1000.0, sleep_fn=lambda s: None)
    assert got.endswith(".empty")


def test_wait_for_window_max_wait_warns(poll_pipe):
    pipe, src = poll_pipe
    clock = {"t": 0.0}

    def now():
        return clock["t"]

    def sleep(s):
        clock["t"] += max(s, 1.0)

    # default max_wait = max(90, 4*10) = 90 -> returns None (warn path)
    assert pipe.wait_for_window(0, now_fn=now, sleep_fn=sleep) is None
    assert clock["t"] >= 90

    # exit_after_max_wait raises instead (W3 strict mode)
    clock["t"] = 0.0
    with pytest.raises(TimeoutError):
        pipe.wait_for_window(0, now_fn=now, sleep_fn=sleep, exit_after_max_wait=True)


def test_wait_for_window_shutdown_fencing(poll_pipe):
    pipe, src = poll_pipe
    ev = threading.Event()
    ev.set()
    with pytest.raises(InterruptedError):
        pipe.wait_for_window(0, shutdown=ev)


def test_wait_for_window_polling_cadence(spark, tmp_path):
    """The documented cadence (main.py:461-501): one sleep straight to
    the ETA, then max(1, dur/10)-second polls — NOT a fixed 1 s spin
    (the pre-fix min()-form collapsed to 1 s the moment now >= eta,
    costing dur/10-fold more object-store HEAD probes)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    pipe = ImportPipeline(
        spark, SPEC, src, str(tmp_path / "lake"), incremental_duration=3600
    )
    clock = {"t": 0.0}
    sleeps: list[float] = []

    def now():
        return clock["t"]

    def sleep(s):
        sleeps.append(s)
        clock["t"] += s
        if len(sleeps) >= 4:  # published after 3 post-ETA polls
            open(
                os.path.join(src, "nindexer-follows-0-3600.parquet"), "w"
            ).close()

    got = pipe.wait_for_window(0, now_fn=now, sleep_fn=sleep, max_wait=1e9)
    assert got is not None
    assert sleeps[0] == 3601.0          # straight to the ETA
    assert sleeps[1:] == [360.0] * 3    # dur/10 polls, not 1 s spins


def test_wait_for_window_shutdown_interrupts_pre_eta_sleep(poll_pipe):
    """W9 fencing must stay responsive DURING the pre-ETA wait, not just
    between naps: with the default wall-clock sleep, the wait parks on
    shutdown.wait(...) (reference sleeps via SHUTDOWN_EVENT.wait,
    main.py:461-501), so a shutdown requested mid-sleep wakes it
    immediately instead of after up to a full window duration."""
    import time as _time

    pipe, src = poll_pipe
    pipe.duration = 3600  # hour-long window: pre-ETA nap would be ~3601 s
    ev = threading.Event()
    t = threading.Timer(0.2, ev.set)
    t.start()
    start = _time.monotonic()
    try:
        with pytest.raises(InterruptedError):
            # now() far before the window ETA -> first nap is the pre-ETA
            # sleep; the timer fires 0.2 s in
            pipe.wait_for_window(int(_time.time()), shutdown=ev)
    finally:
        t.cancel()
    assert _time.monotonic() - start < 30.0  # woke on the event, not the ETA


def test_wait_cadence_is_configurable(spark, tmp_path):
    """publish_eta_offset / poll_interval override the reference's
    hardcoded +1s ETA and 1s poll floor (its S3 exporter cadence,
    main.py:461-501) — a prompt local publisher should be picked up at
    sub-second latency (the daemon-soak configuration)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    pipe = ImportPipeline(
        spark, SPEC, src, str(tmp_path / "lake"), incremental_duration=10,
        publish_eta_offset=0.0, poll_interval=0.1,
    )
    clock = {"t": 1000.0}
    naps = []

    def now():
        return clock["t"]

    def sleep(s):
        naps.append(s)
        clock["t"] += s
        if clock["t"] >= 1010.2:  # published just after close
            open(
                os.path.join(src, "nindexer-follows-1000-1010.parquet"), "w"
            ).close()

    got = pipe.wait_for_window(1000, now_fn=now, sleep_fn=sleep)
    assert got.endswith("nindexer-follows-1000-1010.parquet")
    # first nap runs straight to the zero-offset ETA (the window close),
    # then sub-second polls — never the 1 s floor
    assert naps[0] == 10.0
    assert all(n == 0.1 for n in naps[1:])
    assert clock["t"] < 1011  # picked up well inside the next window


def test_wait_cadence_defaults_match_reference(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    pipe = ImportPipeline(
        spark, SPEC, src, str(tmp_path / "lake"), incremental_duration=10
    )
    assert pipe.publish_eta_offset == 1.0 and pipe.poll_interval is None
