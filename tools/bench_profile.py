"""Per-query profiling harness for the headline bench (guide §1).

Runs each headline query N times in one session, records per-repeat wall
times (min-over-repeats is robust against co-tenant spikes on the shared
box), and — via the Spark UI REST API — the per-job breakdown of each
query's count() so the expensive *jobs inside* a query are attributable.

Usage:
  python tools/bench_profile.py [--repeats 3] [--queries a,b,c] [--plans DIR]

Writes JSON to stdout; optional --plans DIR captures explain("formatted")
for each profiled query (the judge-facing before/after artifacts).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "groupby_temporal",
    "groupby_snapshot",
    "join_backfill",
    "sessionize",
    "lag_lead",
    "dedup_exact",
    "minhash_near_dups",
    "similarity_bruteforce",
    "textstats",
    "webtext_flagship",
]


def _jobs(ui: str, app_id: str) -> list[dict]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--queries", type=str, default=",".join(HEADLINE))
    ap.add_argument("--plans", type=str, default=None)
    ap.add_argument("--suffix", type=str, default="before")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from chronon_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session(app_name="bench_profile", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus),
                          extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    spark.range(1_000_000).agg(F.sum("id")).collect()
    warm = spark.range(10_000).withColumn("g", F.pmod("id", F.lit(64)))
    warm.groupBy("g").applyInPandas(lambda p: p, "id long, g long").count()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = entry.queries()

    out: dict = {"repeats": args.repeats, "queries": {}}
    for name in names:
        rec: dict = {"walls": [], "jobs": None}
        for rep in range(args.repeats):
            before_ids = {j["jobId"] for j in _jobs(ui, app_id)}
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.count()
            wall = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            rec["walls"].append(wall)
            jobs = [j for j in _jobs(ui, app_id) if j["jobId"] not in before_ids]
            jobs_out = []
            for j in sorted(jobs, key=lambda x: x["jobId"]):
                dur = None
                if j.get("completionTime") and j.get("submissionTime"):
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    t1 = datetime.strptime(j["submissionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    t2 = datetime.strptime(j["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    dur = round((t2 - t1).total_seconds(), 3)
                jobs_out.append(
                    {
                        "jobId": j["jobId"],
                        "sec": dur,
                        "tasks": j.get("numTasks"),
                        "stages": len(j.get("stageIds", [])),
                        "desc": (j.get("description") or j.get("name") or "")[:140],
                    }
                )
            # keep the breakdown of the FASTEST repeat so job attributions
            # reflect the calm path, not a co-tenant spike
            if rec["jobs"] is None or wall <= min(rec["walls"]):
                rec["jobs"] = jobs_out
        rec["min"] = min(rec["walls"])
        out["queries"][name] = rec
        print(f"[profile] {name}: walls={rec['walls']} jobs={len(rec['jobs'])}", file=sys.stderr)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

    out["total_min"] = round(sum(r["min"] for r in out["queries"].values()), 3)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
