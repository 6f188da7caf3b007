"""Scaling-efficiency proxy (BASELINE.md protocol): the flagship webtext
point-in-time backfill on the SAME materialized input at local[8] vs
local[32] (cores = executor proxy). Reports feature-vectors/sec at both
and efficiency = (rows/s @32) / (4 × rows/s @8).

Usage: python tools/bench_scaling.py [n_rows] — writes JSON to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES_PATH = "/tmp/chronon_bench_pages"


def materialize(n_rows: int) -> int:
    from chronon_spark.fixtures.webtext import generate_webtext
    from chronon_spark.session import build_session

    spark = build_session(app_name="gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(PAGES_PATH, ignore_errors=True)
    pages = generate_webtext(spark, n_rows=n_rows, n_urls=max(1000, n_rows // 500), days=120, partitions=64)
    pages.write.mode("overwrite").parquet(PAGES_PATH)
    n = spark.read.parquet(PAGES_PATH).count()
    spark.stop()
    return n


def stage_metrics(spark, since_epoch_ms: float) -> dict:
    """Per-stage attribution via the UI REST API: total shuffle bytes and
    task-time skew for the run's heaviest stages — makes the scaling
    number attributable (where parallelism is lost) instead of a single
    wall-clock ratio."""
    import datetime as dt
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
    except Exception as e:  # UI off / endpoint moved — metrics are best-effort
        return {"error": str(e)[:200]}

    def ts(s):
        v = s.get("submissionTime")
        if not v:
            return 0
        return dt.datetime.strptime(v[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp() * 1000

    mine = [s for s in stages if ts(s) >= since_epoch_ms]
    out = {
        "stages": len(mine),
        "shuffle_read_mb": round(sum(s.get("shuffleReadBytes", 0) for s in mine) / 1e6, 1),
        "shuffle_write_mb": round(sum(s.get("shuffleWriteBytes", 0) for s in mine) / 1e6, 1),
        "executor_run_time_s": round(sum(s.get("executorRunTime", 0) for s in mine) / 1e3, 1),
        "input_mb": round(sum(s.get("inputBytes", 0) for s in mine) / 1e6, 1),
    }
    top = sorted(mine, key=lambda s: -s.get("executorRunTime", 0))[:4]
    tops = []
    for st in top:
        row = {
            "stage": st["stageId"],
            "tasks": st.get("numCompleteTasks"),
            "run_s": round(st.get("executorRunTime", 0) / 1e3, 1),
            "shuf_w_mb": round(st.get("shuffleWriteBytes", 0) / 1e6, 1),
            "name": (st.get("name") or "")[:60],
        }
        try:
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages/{st['stageId']}/"
                f"{st.get('attemptId', 0)}/taskSummary?quantiles=0.5,0.95,1.0",
                timeout=10,
            ) as r:
                q = json.load(r)
            rt = q.get("executorRunTime", [0, 0, 0])
            row["task_ms_p50"] = round(rt[0])
            row["task_ms_max"] = round(rt[-1])
            row["skew_max_over_p50"] = round(rt[-1] / rt[0], 2) if rt[0] else None
        except Exception:
            pass
        tops.append(row)
    out["top_stages"] = tops
    return out


def run(
    cores: int,
    repeats: int = 2,
    shuffle: int | None = None,
    driver_mem: str | None = None,
    hot: int | None = None,
) -> dict:
    """``shuffle``/``driver_mem``: at the default 4M-row size one shuffle
    partition per core is the sweet spot, but partition count must scale
    with DATA, not cores — the 40M-row sf1.0 run OOMs at 8 partitions.
    Callers above ~10M rows pass an explicit data-scaled count (identical
    at both parallelism levels, so the comparison stays fair).
    ``hot``: hot_key_threshold for the backfill — a key owning more query
    rows than one shuffle partition's share is by definition a straggler
    on the raw kernel, so callers pass ≈ n_rows // shuffle."""
    from pyspark.sql import functions as F

    from chronon_spark.pipelines.webtext import backfill_features
    from chronon_spark.session import build_session

    extra = {"spark.ui.enabled": "true"}
    if driver_mem:
        extra["spark.driver.memory"] = driver_mem
    spark = build_session(
        app_name=f"scale{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle or cores,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM codegen + python workers + input page cache (equal-warm
    # IO for both parallelism levels)
    spark.range(1_000_000).agg(F.sum("id")).collect()
    spark.range(10_000).withColumn("g", F.pmod("id", F.lit(64))).groupBy("g").applyInPandas(
        lambda p: p, "id long, g long"
    ).count()
    pages = spark.read.parquet(PAGES_PATH)
    pages.count()
    best, n, metrics = None, 0, None
    for _ in range(repeats):
        t0 = time.time()
        n = backfill_features(spark, pages, hot_key_threshold=hot).count()
        dt_ = time.time() - t0
        from chronon_spark.operators.join import release_backfill_caches

        release_backfill_caches()
        if best is None or dt_ < best:
            best = dt_
            metrics = stage_metrics(spark, t0 * 1000)
    spark.stop()
    return {
        "cores": cores,
        "rows": n,
        "sec": round(best, 2),
        "rows_per_sec": round(n / best, 1),
        "stage_metrics": metrics,
    }


def _hw_control() -> dict:
    """TWO hardware scaling ceilings of this VM, measured inline:
    - cpu: cache-resident integer burn (pure compute ceiling)
    - membw: in-place numpy streaming over 100MB/worker arrays (memory
      bandwidth ceiling — the binding resource for Arrow/shuffle work)
    On this time-shared box the memory ceiling routinely ANTI-scales
    (8→32 workers can be 2-4× slower wall-clock for the same total
    bytes): no memory-streaming system can approach 4× here. Engine
    efficiency is reported raw and against both ceilings."""
    import multiprocessing as mp

    def bench_cpu(workers: int, total: int = 240_000_000) -> float:
        per = total // workers
        t0 = time.time()
        with mp.Pool(workers) as p:
            p.map(_burn, [per] * workers)
        return time.time() - t0

    def bench_mem(workers: int, total_iters: int = 256) -> float:
        per = total_iters // workers
        with mp.Pool(workers, initializer=_mem_init) as p:
            p.map(_mem_work, [2] * workers)  # warm pages
            t0 = time.time()
            p.map(_mem_work, [per] * workers)
            return time.time() - t0

    c8, c32 = bench_cpu(8), bench_cpu(32)
    m8, m32 = bench_mem(8), bench_mem(32)
    return {
        "burn8_sec": round(c8, 2),
        "burn32_sec": round(c32, 2),
        "ceiling": round(c8 / c32, 3),
        "membw8_sec": round(m8, 2),
        "membw32_sec": round(m32, 2),
        "membw_ceiling": round(m8 / m32, 3),
    }


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


_MEM_A = None
_MEM_B = None


def _mem_init():
    global _MEM_A, _MEM_B
    import numpy as np

    _MEM_A = np.arange(12_500_000, dtype=np.float64)  # 100MB
    _MEM_B = np.empty_like(_MEM_A)


def _mem_work(n_iters: int) -> float:
    import numpy as np

    s = 0.0
    for _ in range(n_iters):
        np.multiply(_MEM_A, 1.0000001, out=_MEM_B)
        s += float(_MEM_B[::1000].sum())
    return s


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    total = materialize(n_rows)
    # interleave levels; report the best per level (steady-state compute,
    # equal cache conditions)
    runs8 = [run(8)]
    runs32 = [run(32)]
    runs8.append(run(8))
    runs32.append(run(32))
    r8 = min(runs8, key=lambda r: r["sec"])
    r32 = min(runs32, key=lambda r: r["sec"])
    speedup = r32["rows_per_sec"] / r8["rows_per_sec"]
    hw = _hw_control()
    print(
        json.dumps(
            {
                "input_rows": total,
                "local8": r8,
                "local32": r32,
                "speedup_8_to_32": round(speedup, 3),
                "scaling_efficiency_4x": round(speedup / 4.0, 3),
                "hw_control": hw,
                "efficiency_vs_hw_ceiling": round(speedup / hw["ceiling"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
