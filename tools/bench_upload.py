"""Serving-layout bench: KV upload/fetch vs raw history rescan.

The point of the upload artifact (operators/upload.py, the reference's
GroupByUpload/FinalBatchIr) is that point-in-time serving reads BOUNDED
per-key state (tail hop IRs + streamed head) instead of rescanning
history. This protocol measures that directly on a deterministic
synthetic shape big enough for the history term to dominate:

- N_EVENTS events over DAYS days for N_USERS keys (seeded numpy),
- upload built at the second-to-last day's boundary,
- N_QUERIES point fetches spread over the last (serving) day,
- the same queries answered by the raw as-of kernel over FULL history.

Both paths produce identical values (the pytest suite asserts parity);
here we record wall clock: upload build (amortized once per day),
fetch, and the raw rescan, plus fetches/s. Artifact:
BENCH/round5_upload_serving.json.

Run: python tools/bench_upload.py [quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronon_spark.api.types import (  # noqa: E402
    Accuracy,
    Aggregation,
    EventSource,
    GroupBy,
    Operation,
    Window,
)
from chronon_spark.operators.temporal import temporal_events  # noqa: E402
from chronon_spark.operators.upload import (  # noqa: E402
    boundary_millis,
    fetch_features,
    group_by_upload,
)
from chronon_spark.session import build_session  # noqa: E402

MS_DAY = 86_400_000
T0 = 1_700_006_400_000  # day-aligned
DAYS = 60
END_DS = "2024-01-12"  # day 59 boundary (T0 + 59d) — upload covers days 0..58
QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"
N_EVENTS = 200_000 if QUICK else 2_000_000
N_USERS = 500 if QUICK else 2_000
N_QUERIES = 20_000 if QUICK else 200_000


def make_frames(spark):
    rng = np.random.default_rng(7)
    ev = pd.DataFrame(
        {
            "user": rng.integers(0, N_USERS, N_EVENTS).astype(np.int64),
            "ts": (T0 + rng.integers(0, DAYS * MS_DAY, N_EVENTS)).astype(np.int64),
            "v": np.round(rng.gamma(3.0, 25.0, N_EVENTS), 2),
            "cat": rng.choice([f"c{i}" for i in range(12)], N_EVENTS),
        }
    )
    boundary = boundary_millis(END_DS)
    q = pd.DataFrame(
        {
            "user": rng.integers(0, N_USERS, N_QUERIES).astype(np.int64),
            "ts": (boundary + rng.integers(0, MS_DAY, N_QUERIES)).astype(np.int64),
            "qid": np.arange(N_QUERIES, dtype=np.int64),
        }
    )
    return (
        spark.createDataFrame(ev).repartition(32).persist(),
        spark.createDataFrame(q).repartition(32).persist(),
    )


GB = GroupBy(
    name="bench_serving_gb",
    sources=(EventSource(table="ev"),),
    key_columns=("user",),
    aggregations=(
        Aggregation("v", Operation.COUNT, windows=(None,)),
        Aggregation("v", Operation.SUM, windows=(Window(7),)),
        Aggregation("v", Operation.AVERAGE, windows=(Window(3),)),
        Aggregation("v", Operation.MAX, windows=(Window(7),)),
        Aggregation("v", Operation.LAST, windows=(Window(7),)),
        Aggregation("v", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(7),)),
        Aggregation(
            "v", Operation.BOUNDED_UNIQUE_COUNT, arg_map={"k": 10}, windows=(Window(7),)
        ),
        Aggregation(
            "v",
            Operation.APPROX_PERCENTILE,
            arg_map={"percentiles": [0.5]},
            windows=(Window(7),),
        ),
        Aggregation(
            "cat", Operation.APPROX_HISTOGRAM_K, arg_map={"k": 3}, windows=(Window(7),)
        ),
        Aggregation("cat", Operation.APPROX_UNIQUE_COUNT, windows=(Window(7),)),
    ),
    accuracy=Accuracy.TEMPORAL,
)


def main():
    spark = build_session(app_name="bench_upload_serving")
    spark.sparkContext.setLogLevel("ERROR")
    ev, q = make_frames(spark)
    ev.count(), q.count()  # materialize inputs outside the timed region
    boundary = boundary_millis(END_DS)
    head = ev.filter(f"ts >= {boundary}")

    t0 = time.monotonic()
    up = group_by_upload(spark, GB, ev, END_DS).persist()
    n_keys = up.count()
    t_upload = time.monotonic() - t0

    t0 = time.monotonic()
    fetched = fetch_features(spark, GB, up, head, q, END_DS)
    n_fetched = fetched.count()
    t_fetch = time.monotonic() - t0

    t0 = time.monotonic()
    raw = temporal_events(spark, GB, q, ev, mode="raw", passthrough=True)
    n_raw = raw.count()
    t_raw = time.monotonic() - t0

    assert n_fetched == n_raw == N_QUERIES, (n_fetched, n_raw)
    rec = {
        "protocol": "upload+fetch vs raw full-history rescan, same queries",
        "n_events": N_EVENTS,
        "n_users": N_USERS,
        "n_queries": N_QUERIES,
        "days_history": DAYS,
        "n_upload_keys": n_keys,
        "upload_build_s": round(t_upload, 2),
        "fetch_s": round(t_fetch, 2),
        "fetch_per_s": round(N_QUERIES / t_fetch),
        "raw_rescan_s": round(t_raw, 2),
        "serve_speedup_vs_raw": round(t_raw / t_fetch, 2),
        "speedup_incl_upload_build": round(t_raw / (t_fetch + t_upload), 2),
        "master": spark.sparkContext.master,
    }
    print(json.dumps(rec))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "round5_upload_serving.json")
    if not QUICK:
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
