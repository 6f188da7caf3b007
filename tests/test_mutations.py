"""Temporal entities (mutations) vs hand-computed expectations —
the MutationsTest.scala:33-62 scenarios: update (before+after pair),
insert (after-only), delete (before-only)."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import Aggregation, EntitySource, GroupBy, Operation
from chronon_spark.operators.mutations import temporal_entities

D = "2023-11-20"  # query day; snapshot day is D-1
MID = 1_700_438_400_000  # 2023-11-20 00:00 UTC


@pytest.fixture(scope="module")
def frames(spark):
    # EOD state of 2023-11-19: listing 1 → ratings [4, 5]; listing 2 → [3]
    snapshots = spark.createDataFrame(
        [
            (1, 4.0, "2023-11-19"),
            (1, 5.0, "2023-11-19"),
            (2, 3.0, "2023-11-19"),
        ],
        "listing_id int, rating double, ds string",
    )
    # day-D mutations:
    #   t1: update listing1 rating 4 → 2   (before 4, after 2)
    #   t2: insert listing2 rating 5       (after only)
    #   t3: delete listing1 rating 5       (before only)
    t1, t2, t3 = MID + 1_000_000, MID + 2_000_000, MID + 3_000_000
    mutations = spark.createDataFrame(
        [
            (1, 4.0, t1, True, D),
            (1, 2.0, t1, False, D),
            (2, 5.0, t2, False, D),
            (1, 5.0, t3, True, D),
        ],
        "listing_id int, rating double, mutation_ts long, is_before boolean, ds string",
    )
    queries = spark.createDataFrame(
        [
            (1, MID + 500_000, D),   # before any mutation → snapshot state
            (1, t1, D),              # at exactly t1 (EXCLUSIVE) → snapshot [4, 5]
            (1, t1 + 1, D),          # just after t1 → [2, 5]
            (1, t3 + 1, D),          # after delete → [2]
            (2, t2 + 1, D),          # after insert → [3, 5]
            (3, MID + 10, D),        # unseen listing → nulls
        ],
        "listing_id int, ts long, ds string",
    )
    return snapshots, mutations, queries


def _gb(*aggs):
    return GroupBy(
        name="mut",
        sources=(EntitySource(snapshot_table="snap"),),
        key_columns=("listing_id",),
        aggregations=tuple(aggs),
    )


def test_abelian_ops_honor_deletes(spark, frames):
    snapshots, mutations, queries = frames
    gb = _gb(
        Aggregation("rating", Operation.SUM),
        Aggregation("rating", Operation.COUNT),
        Aggregation("rating", Operation.AVERAGE),
    )
    out = temporal_entities(spark, gb, queries, snapshots, mutations)
    rows = {(r["listing_id"], r["ts"]): r for r in out.collect()}
    t1, t3 = MID + 1_000_000, MID + 3_000_000

    r = rows[(1, MID + 500_000)]  # snapshot [4,5]
    assert (r["rating_sum"], r["rating_count"], r["rating_average"]) == (9.0, 2, 4.5)
    # a query at exactly t1 must NOT see t1's mutation (mutationTs < queryTs
    # strictly, SawtoothMutationAggregator.scala:204) — still snapshot [4,5]
    r = rows[(1, t1)]
    assert (r["rating_sum"], r["rating_count"]) == (9.0, 2)
    r = rows[(1, t1 + 1)]  # update visible just after t1 → [2,5]
    assert (r["rating_sum"], r["rating_count"]) == (7.0, 2)
    r = rows[(1, t3 + 1)]  # delete of 5 → [2]
    assert (r["rating_sum"], r["rating_count"]) == (2.0, 1)
    r = rows[(2, MID + 2_000_000 + 1)]  # insert → [3,5]
    assert (r["rating_sum"], r["rating_count"]) == (8.0, 2)
    r = rows[(3, MID + 10)]
    assert r["rating_sum"] is None and r["rating_count"] is None


def test_histogram_honors_deletes(spark, frames):
    """HISTOGRAM is deletable in the reference (SimpleAggregators.scala:
    250-322): ±1 per value, keys removed at exactly 0, negatives kept."""
    snapshots, mutations, queries = frames
    gb = _gb(Aggregation("rating", Operation.HISTOGRAM))
    out = temporal_entities(spark, gb, queries, snapshots, mutations)
    rows = {(r["listing_id"], r["ts"]): r for r in out.collect()}
    t1, t3 = MID + 1_000_000, MID + 3_000_000
    # snapshot [4.0, 5.0]
    assert dict(rows[(1, MID + 500_000)]["rating_histogram"]) == {"4.0": 1, "5.0": 1}
    # at exactly t1: mutation excluded → still snapshot
    assert dict(rows[(1, t1)]["rating_histogram"]) == {"4.0": 1, "5.0": 1}
    # after t1 update (4→2): key '4.0' dropped at zero, '2.0' added
    assert dict(rows[(1, t1 + 1)]["rating_histogram"]) == {"2.0": 1, "5.0": 1}
    # after t3 delete of 5 → only '2.0' remains
    assert dict(rows[(1, t3 + 1)]["rating_histogram"]) == {"2.0": 1}


def test_windowed_mutations_vs_naive(spark):
    """Windowed entity aggregates: window predicate on ROW ts (sawtooth
    round(qt−w, hop) ≤ ts < qt), mutation cutoff on mutation_ts < qt —
    SawtoothMutationAggregator.scala:112-127 + :204. Random scenario vs a
    direct python oracle."""
    import numpy as np

    from chronon_spark.api.types import Window as W

    rng = np.random.default_rng(5)
    MS_DAY = 86_400_000
    rows = []
    # rows carry their own event ts spread over the last 10 days
    for i in range(120):
        lid = int(rng.integers(1, 4))
        mts = MID + int(rng.integers(0, MS_DAY))
        rts = MID - int(rng.integers(0, 10 * MS_DAY))
        val = float(rng.integers(1, 50))
        is_before = bool(rng.random() < 0.3)
        rows.append((lid, val, mts, rts, is_before, D))
    mutations = spark.createDataFrame(
        rows, "listing_id int, rating double, mutation_ts long, ts long, is_before boolean, ds string"
    )
    snapshots = spark.createDataFrame([], "listing_id int, rating double, ds string")
    queries = spark.createDataFrame(
        [(int(rng.integers(1, 4)), MID + int(rng.integers(0, MS_DAY)), D) for _ in range(60)],
        "listing_id int, ts long, ds string",
    ).distinct()
    gb = _gb(
        Aggregation("rating", Operation.SUM, windows=(W(7),)),
        Aggregation("rating", Operation.COUNT, windows=(W(7),)),
        Aggregation("rating", Operation.MAX, windows=(W(3),)),
    )
    out = {(r["listing_id"], r["ts"]): r for r in
           temporal_entities(spark, gb, queries, snapshots, mutations).collect()}
    parts = gb.unpacked()
    for (lid, qt, _) in queries.collect():
        r = out[(lid, qt)]
        for p in parts:
            w, hop = p.window.millis, p.hop_millis
            tail = ((qt - w) // hop) * hop
            sel = [
                (v, -1.0 if b else 1.0)
                for (l2, v, mts, rts, b, _) in rows
                if l2 == lid and mts < qt and tail <= rts < qt
            ]
            if p.operation is Operation.MAX:
                ins = [v for v, wgt in sel if wgt > 0]
                exp = max(ins) if ins else None
            else:
                n = sum(wgt for _, wgt in sel)
                if n <= 0:
                    exp = None
                elif p.operation is Operation.COUNT:
                    exp = int(n)
                else:
                    exp = sum(v * wgt for v, wgt in sel)
            got = r[p.output_column]
            if exp is None:
                assert got is None, (p.output_column, got, exp)
            else:
                assert got == pytest.approx(exp), (p.output_column, got, exp)


def test_bucketed_mutations(spark, frames):
    """Bucketed entity aggregates → Map[bucket → value] with deletes."""
    snapshots, mutations, queries = frames
    snapshots = snapshots.withColumn("cat", F.expr("CASE WHEN rating >= 4.5 THEN 'hi' ELSE 'lo' END"))
    mutations = mutations.withColumn("cat", F.expr("CASE WHEN rating >= 4.5 THEN 'hi' ELSE 'lo' END"))
    gb = _gb(Aggregation("rating", Operation.SUM, buckets=("cat",)))
    out = temporal_entities(spark, gb, queries, snapshots, mutations)
    rows = {(r["listing_id"], r["ts"]): r for r in out.collect()}
    t1, t3 = MID + 1_000_000, MID + 3_000_000
    col = "rating_sum_by_cat"
    # snapshot [4 lo, 5 hi]
    assert dict(rows[(1, MID + 500_000)][col]) == {"lo": 4.0, "hi": 5.0}
    # after t1 (4→2 update): lo bucket = 4 - 4 + 2 = 2, hi = 5
    assert dict(rows[(1, t1 + 1)][col]) == {"lo": 2.0, "hi": 5.0}
    # after t3 delete of 5: hi bucket sums to 0 → entry stays (sum 0.0)
    got = dict(rows[(1, t3 + 1)][col])
    assert got["lo"] == 2.0 and got.get("hi", 0.0) == pytest.approx(0.0)


def test_monoid_ops_ignore_deletes(spark, frames):
    snapshots, mutations, queries = frames
    gb = _gb(
        Aggregation("rating", Operation.MAX),
        Aggregation("rating", Operation.UNIQUE_COUNT),
    )
    out = temporal_entities(spark, gb, queries, snapshots, mutations)
    rows = {(r["listing_id"], r["ts"]): r for r in out.collect()}
    t3 = MID + 3_000_000
    # monoid MAX keeps 5 even after its delete (inserts-only fold)
    r = rows[(1, t3 + 1)]
    assert r["rating_max"] == 5.0
    assert r["rating_unique_count"] == 3  # {4, 5, 2} inserted at some point


def test_mutations_property(spark):
    """Hypothesis fuzz of the two-time-axis entity kernel: random
    snapshot state, mutation streams (update/insert/delete, boundary
    mutation_ts == query ts), windowed + unbounded ops vs a direct
    python replay oracle."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chronon_spark.api.types import Window as W

    MS_DAY_ = 86_400_000

    @settings(max_examples=6, deadline=None)
    @given(
        n_mut=st.integers(1, 25),
        n_snap=st.integers(0, 8),
        seed=st.integers(0, 10_000),
        boundary=st.booleans(),
    )
    def run(n_mut, n_snap, seed, boundary):
        import numpy as np

        rng = np.random.default_rng(seed)
        D_ = "2023-11-20"
        snap_rows = [
            (int(rng.integers(1, 3)), float(rng.integers(1, 30)), "2023-11-19")
            for _ in range(n_snap)
        ]
        snapshots = spark.createDataFrame(
            snap_rows or [], "listing_id int, rating double, ds string"
        ) if snap_rows else spark.createDataFrame([], "listing_id int, rating double, ds string")
        rows = []
        for _ in range(n_mut):
            lid = int(rng.integers(1, 3))
            mts = MID + int(rng.integers(0, MS_DAY_))
            rts = MID - int(rng.integers(0, 6 * MS_DAY_))
            rows.append(
                (lid, float(rng.integers(1, 30)), mts, rts, bool(rng.random() < 0.35), D_)
            )
        mutations = spark.createDataFrame(
            rows,
            "listing_id int, rating double, mutation_ts long, ts long, is_before boolean, ds string",
        )
        qts = [MID + int(rng.integers(0, MS_DAY_)) for _ in range(12)]
        if boundary:
            qts.append(rows[0][2])  # query exactly AT a mutation_ts (exclusive)
        queries = spark.createDataFrame(
            [(int(rng.integers(1, 3)), qt, D_) for qt in qts],
            "listing_id int, ts long, ds string",
        ).distinct()
        gb = _gb(
            Aggregation("rating", Operation.SUM, windows=(W(4),)),
            Aggregation("rating", Operation.COUNT, windows=(None,)),
            Aggregation("rating", Operation.AVERAGE, windows=(W(4),)),
        )
        got = {
            (r["listing_id"], r["ts"]): r
            for r in temporal_entities(spark, gb, queries, snapshots, mutations).collect()
        }
        for (lid, qt, _) in queries.collect():
            r = got[(lid, qt)]
            for p in gb.unpacked():
                if p.window is not None:
                    w, hop = p.window.millis, p.hop_millis
                    tail = ((qt - w) // hop) * hop
                else:
                    tail = -1 << 62
                # snapshot rows carry the EOD state (row ts = snapshot day end)
                sel = [
                    (v, 1.0)
                    for (l2, v, _ds) in snap_rows
                    if l2 == lid and tail <= MID - 1 < qt
                ] + [
                    (v, -1.0 if b else 1.0)
                    for (l2, v, mts, rts, b, _ds) in rows
                    if l2 == lid and mts < qt and tail <= rts < qt
                ]
                n = sum(wgt for _, wgt in sel)
                s = sum(v * wgt for v, wgt in sel)
                if p.operation is Operation.COUNT:
                    exp = int(n) if n > 0 else None
                elif p.operation is Operation.SUM:
                    exp = s if n > 0 else None
                else:
                    exp = s / n if n > 0 else None
                got_v = r[p.output_column]
                if exp is None:
                    assert got_v is None, (p.output_column, got_v, exp)
                else:
                    assert got_v == pytest.approx(exp), (p.output_column, got_v, exp)

    run()
