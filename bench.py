"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` = total wall-time of the headline suite. Also reports
feature-vectors/sec for the flagship point-in-time backfill and, when
BENCH_SCALING=1, a local[8]-vs-local[32] scaling-efficiency proxy
(BASELINE.md protocol). The scaling input auto-scales: when the box's
inline memory-bandwidth control anti-scales below ~0.55 (a co-tenant
window where 32 streaming threads get less aggregate bandwidth than 8
— the confound behind r3-r5's false "regressions"), the compute-bound
sf1-protocol fixture (BENCH_SCALING_ROWS_SF1, data-scaled shuffle
partitions) replaces the 4M-row proxy. Force with
BENCH_SCALING_MODE=small|sf1.
"""

from __future__ import annotations

import json
import os
import sys
import time

# must precede the first JVM launch: local-mode driver memory is fixed at
# gateway start and later sessions inherit it — the compute-bound scaling
# fixture (≥20M rows) needs more than the default heap
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "groupby_temporal",      # the as-of core
    "groupby_snapshot",      # daily windowed backfill
    "join_backfill",         # multi-part point-in-time join
    "sessionize",
    "lag_lead",
    "dedup_exact",
    "minhash_near_dups",
    "similarity_bruteforce",
    "textstats",
    "webtext_flagship",
]


def run_suite(master: str, sf_dir: str, shuffle: int) -> tuple[dict[str, float], int]:
    from chronon_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session(app_name="bench", master=master, shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    # warm up JVM codegen + python workers so timings measure operators,
    # not first-job startup
    import pandas as pd
    from pyspark.sql import functions as F

    spark.range(1_000_000).agg(F.sum("id")).collect()
    warm = spark.range(10_000).withColumn("g", F.pmod("id", F.lit(64)))
    warm.groupBy("g").applyInPandas(lambda p: p, "id long, g long").count()
    qs = entry.queries()
    timings: dict[str, float] = {}
    flagship_rows = 0
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        if name == "groupby_temporal":
            flagship_rows = n
    spark.stop()
    return timings, flagship_rows


def _wait_calm(max_wait_s: float, thresh: float = 2.0) -> float:
    """Bounded wait for a calm 1-min loadavg on the shared box — co-tenant
    spikes every ~15-20 min read 2-3x slow; measuring inside one wastes
    the artifact. Returns seconds waited."""
    import sys
    import time as _time

    waited = 0.0
    while waited < max_wait_s:
        try:
            load1 = float(open("/proc/loadavg").read().split()[0])
        except OSError:
            break
        if load1 < thresh:
            break
        print(f"[bench] load {load1:.1f} — waiting for calm window", file=sys.stderr)
        _time.sleep(20)
        waited += 20
    return waited


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    _wait_calm(float(os.environ.get("BENCH_WAIT_CALM", "240")))
    timings, flagship_rows = run_suite(f"local[{cpus}]", sf_dir, int(cpus))
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall-time (point-in-time backfill + pipeline ops)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "flagship_feature_vectors": flagship_rows,
        "flagship_fv_per_sec": round(flagship_rows / timings["groupby_temporal"], 1)
        if timings.get("groupby_temporal")
        else None,
    }

    # scaling evidence (north-rule criterion): the flagship backfill on the
    # same materialized input at local[8] vs local[32], plus the VM's own
    # raw-CPU ceiling for the same 4x thread scaling (virtualized cores
    # rarely deliver 4x; see BENCH/BASELINE.md §1). Skip with BENCH_SCALING=0.
    if os.environ.get("BENCH_SCALING", "1") != "0":
        import tools.bench_scaling as bs

        # re-check calm before the scaling pair (the headline suite above
        # takes minutes — the window can close mid-run)
        waited = _wait_calm(float(os.environ.get("BENCH_WAIT_CALM", "240")) / 2)
        # hw ceilings bracketed BEFORE and AFTER: a collapsed post-ceiling
        # flags that ambient load closed in mid-run (attribution, not spin)
        hw_pre = bs._hw_control()
        # mode selection (r5 verdict #2): the 4M-row job read as a false
        # regression in three consecutive windows where the box's membw
        # control ANTI-scaled (32 streaming threads got LESS aggregate
        # bandwidth than 8) — in such windows, or when forced, run the
        # compute-bound sf1-protocol fixture instead (data-scaled shuffle
        # partitions, input large enough that compute dominates overhead;
        # r5's 40M record sat at 1.025x of the burn ceiling)
        mode = os.environ.get("BENCH_SCALING_MODE", "auto")
        if mode == "auto":
            mode = "sf1" if hw_pre["membw_ceiling"] < 0.55 else "small"
        if mode == "sf1":
            # 16M: ~4x the overhead-dominated 4M proxy, compute-bound by
            # stage attribution, yet keeps the whole bench inside a
            # per-round budget (the 40M record lives in BENCH/
            # round5_sf1_scaling.json via tools/bench_sf1.py)
            n_rows = int(os.environ.get("BENCH_SCALING_ROWS_SF1", "16000000"))
            bs.PAGES_PATH = f"/tmp/chronon_bench_pages_{n_rows // 1_000_000}m"
            shuffle = max(32, n_rows // 250_000)
            # _SUCCESS, not the bare dir: a killed materialize leaves a
            # partial directory that read.parquet rejects
            if not os.path.exists(os.path.join(bs.PAGES_PATH, "_SUCCESS")):
                bs.materialize(n_rows)
        else:
            # 4M rows: small enough to finish in ~1 min, large enough that
            # compute dominates stage overheads (1M showed only task-startup)
            n_rows = int(os.environ.get("BENCH_SCALING_ROWS", "4000000"))
            shuffle = None
            bs.materialize(n_rows)
        r8 = bs.run(8, repeats=2, shuffle=shuffle)
        r32 = bs.run(32, repeats=2, shuffle=shuffle)
        hw = bs._hw_control()
        speedup = r32["rows_per_sec"] / r8["rows_per_sec"]
        ceiling = (hw_pre["ceiling"] + hw["ceiling"]) / 2.0
        membw_ceiling = (hw_pre["membw_ceiling"] + hw["membw_ceiling"]) / 2.0
        out["scaling"] = {
            "job": "webtext point-in-time backfill, same materialized input",
            "mode": mode,
            "input_rows": n_rows,
            "shuffle_partitions": shuffle,
            "calm_wait_s": round(waited, 1),
            "local8": r8,
            "local32": r32,
            "speedup_8_to_32": round(speedup, 3),
            "efficiency_4x": round(speedup / 4.0, 3),
            "hw_ceiling_control_pre": hw_pre,
            "hw_ceiling_control": hw,
            "efficiency_vs_hw_ceiling": round(speedup / ceiling, 3),
            "efficiency_vs_membw_ceiling": round(speedup / membw_ceiling, 3)
            if membw_ceiling > 0
            else None,
        }

    # stable artifact path first: BENCH_r04.json came back `parsed: null`
    # because the driver's captured tail lost the stdout JSON line — the
    # file survives regardless of how much log noise surrounds the run
    try:
        os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "latest.json"), "w"
        ) as f:
            json.dump(out, f)
            f.write("\n")
    except OSError as e:
        print(f"[bench] could not write BENCH/latest.json: {e}", file=sys.stderr)

    print(json.dumps(out), flush=True)
    # compact one-line summary as the very LAST stdout line (headline +
    # per-query + scaling + both hw controls), small enough that no tail
    # capture can truncate it away from the artifact
    sc = out.get("scaling") or {}
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "queries": out["queries"],
        "sf": out["sf"],
        "flagship_fv_per_sec": out["flagship_fv_per_sec"],
        "scaling_mode": sc.get("mode"),
        "scaling_rows": sc.get("input_rows"),
        "speedup_8_to_32": sc.get("speedup_8_to_32"),
        "efficiency_4x": sc.get("efficiency_4x"),
        "hw_ceiling_pre": (sc.get("hw_ceiling_control_pre") or {}).get("ceiling"),
        "hw_ceiling_post": (sc.get("hw_ceiling_control") or {}).get("ceiling"),
        "membw_ceiling_pre": (sc.get("hw_ceiling_control_pre") or {}).get("membw_ceiling"),
        "membw_ceiling_post": (sc.get("hw_ceiling_control") or {}).get("membw_ceiling"),
        "efficiency_vs_hw_ceiling": sc.get("efficiency_vs_hw_ceiling"),
        "efficiency_vs_membw_ceiling": sc.get("efficiency_vs_membw_ceiling"),
        "full_artifact": "BENCH/latest.json",
    }
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
