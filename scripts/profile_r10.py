"""Round-10 optimization measurement harness.

Three modes, all sharing bench.py's session + warmup discipline so the
numbers are comparable with the official bench:

  # one timed pass over a subset (or all) bench queries at $SPARK_GRAFT_SF_DIR
  python scripts/profile_r10.py time [query ...]

  # .explain("formatted") for the named queries -> plans/r10/<q>_<tag>.txt
  python scripts/profile_r10.py explain <tag> <query> [query ...]

  # per-job wall-clock breakdown of ONE query (job descriptions + durations
  # via the status tracker REST-free API): where do multi-job queries spend?
  python scripts/profile_r10.py jobs <query>

Timing methodology matches bench.py: .count() on the result after a
sf0.001 warmup pass, release_cached()+clearCache()+System.gc() between
queries. Not a replacement for bench.py — a faster inner loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neynar_parquet_importer_spark.operators.dedup import release_cached
from neynar_parquet_importer_spark.plans.queries import QUERIES, reset_model_caches
from neynar_parquet_importer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def _spark():
    s = get_spark(
        app_name="profile_r10",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _quiesce(spark):
    release_cached()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def mode_time(names: list[str]) -> None:
    from bench import BENCH_QUERIES

    names = names or BENCH_QUERIES
    spark = _spark()
    for n in names:
        try:
            QUERIES[n](spark, WARM_DIR).count()
        except Exception:
            pass
    _quiesce(spark)
    out = {}
    for n in names:
        _quiesce(spark)
        t0 = time.perf_counter()
        QUERIES[n](spark, SF_DIR).count()
        out[n] = round(time.perf_counter() - t0, 3)
        print(f"{out[n]:8.3f}  {n}", flush=True)
    print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))
    spark.stop()


def mode_explain(tag: str, names: list[str]) -> None:
    spark = _spark()
    os.makedirs("plans/r10", exist_ok=True)
    for n in names:
        df = QUERIES[n](spark, SF_DIR)
        jvm = spark._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        txt = df._jdf.queryExecution().explainString(mode)
        path = f"plans/r10/{n}_{tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


def mode_jobs(name: str) -> None:
    spark = _spark()
    try:
        QUERIES[name](spark, WARM_DIR).count()
    except Exception:
        pass
    _quiesce(spark)
    reset_model_caches()
    sc = spark.sparkContext
    wall0 = time.time() * 1000.0  # ms epoch — JobData timestamps are java Dates
    t0 = time.perf_counter()
    QUERIES[name](spark, SF_DIR).count()
    total = time.perf_counter() - t0
    # pull per-job wall clock from the AppStatusStore's jobsList (the
    # per-id store.job() lookup returns empty Options through py4j)
    store = sc._jsc.sc().statusStore()
    jl = store.jobsList(None)
    rows = []
    for i in range(jl.size()):
        j = jl.apply(i)
        sub = j.submissionTime()
        if not sub.isDefined():
            continue
        sub_ms = sub.get().getTime()
        if sub_ms < wall0 - 50:
            continue  # warmup / earlier queries
        comp = j.completionTime()
        dur = (
            (comp.get().getTime() - sub_ms) / 1000.0 if comp.isDefined() else None
        )
        rows.append((sub_ms, j.jobId(), dur, j.stageIds().size(), j.name()))
    rows.sort()
    gap_total = 0.0
    prev_end = wall0
    print(f"total {total:.3f}s, {len(rows)} jobs in timed region")
    for sub_ms, jid, dur, nstages, jname in rows:
        gap = (sub_ms - prev_end) / 1000.0
        gap_total += max(0.0, gap)
        if dur is not None:
            prev_end = sub_ms + dur * 1000.0
        print(
            f"job {jid:4d}  {dur if dur is not None else -1:7.3f}s  "
            f"gap {gap:6.3f}s  stages={nstages}  {jname[:90]}"
        )
    print(f"sum of inter-job gaps (driver-side time): {gap_total:.3f}s")
    spark.stop()


def _stage_rows(spark, min_stage_id: int):
    jvm = spark._jvm
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    quantiles = spark.sparkContext._gateway.new_array(jvm.double, 0)
    sl = store.stageList(empty, False, False, quantiles, empty)
    rows = []
    max_sid = min_stage_id
    for i in range(sl.size()):
        s = sl.apply(i)
        sid = s.stageId()
        max_sid = max(max_sid, sid + 1)
        if str(s.status()) != "COMPLETE" or sid < min_stage_id:
            continue
        dur = 0.0
        if (
            s.completionTime().isDefined()
            and s.firstTaskLaunchedTime().isDefined()
        ):
            dur = (
                s.completionTime().get().getTime()
                - s.firstTaskLaunchedTime().get().getTime()
            ) / 1000.0
        rows.append(
            (
                sid,
                s.numCompleteTasks(),
                dur,
                s.executorRunTime() / 1000.0,
            )
        )
    rows.sort()
    return rows, max_sid


def mode_stages(names: list[str]) -> None:
    """Per-stage task counts + wall + summed executor run time, one or
    more queries in one session — separates partition starvation (few
    tasks, long wall) from genuine compute (exec_run ~ wall x cores)."""
    spark = _spark()
    for name in names:
        try:
            QUERIES[name](spark, WARM_DIR).count()
        except Exception:
            pass
    # drain the async listener bus BEFORE the initial snapshot too (r10
    # advisor): warmup stages with in-flight completion events would
    # otherwise land above the floor and be misattributed to the first
    # timed query
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    floor_sid = _stage_rows(spark, 0)[1]
    for name in names:
        _quiesce(spark)
        reset_model_caches()
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).count()
        wall = time.perf_counter() - t0
        # drain the async listener bus before snapshotting, or the last
        # stages' completion events are missed and misattributed to the
        # NEXT query once floor_sid advances past them
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
        rows, floor_sid = _stage_rows(spark, floor_sid)
        print(f"== {name}: wall {wall:.2f}s, {len(rows)} completed stages")
        for sid, ntask, dur, run in rows:
            print(
                f"stage {sid:4d} tasks={ntask:4d} wall={dur:7.3f}s "
                f"exec_run_total={run:7.3f}s"
            )
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "time":
        mode_time(sys.argv[2:])
    elif mode == "explain":
        mode_explain(sys.argv[2], sys.argv[3:])
    elif mode == "jobs":
        mode_jobs(sys.argv[2])
    elif mode == "stages":
        mode_stages(sys.argv[2:])
    else:
        raise SystemExit(f"unknown mode {mode}")
