"""Definitional point-in-time oracle — a pandas port of the reference's
NaiveAggregator (aggregator/src/test/.../NaiveAggregator.scala:24-48):
O(events × queries) re-aggregation applying the window predicate

    floor((qt − w)/hop)*hop  <=  ts  <  qt

directly per query. Deliberately slow and obvious; every engine path is
checked against this.
"""

from __future__ import annotations

import numpy as np

from chronon_spark.api.types import AggregationPart, Operation


def naive_feature(
    part: AggregationPart,
    ev_ts: np.ndarray,
    ev_vals: np.ndarray,
    qt: int,
    buckets: np.ndarray | None = None,
):
    """Compute one feature value for one query timestamp, or a dict per
    bucket when part.bucket is set (buckets = event bucket values)."""
    if part.operation in (
        Operation.FIRST,
        Operation.LAST,
        Operation.FIRST_K,
        Operation.LAST_K,
    ):
        # both engine kernels order exact-tie timestamps by (ts, value) —
        # the documented deterministic tie-break (tiled.py docstring); the
        # reference leaves tie order unspecified, so the oracle asserts
        # the documented order
        if ev_vals.dtype == object:
            try:  # numbers boxed as objects still tie-order numerically
                key = np.array(
                    [-np.inf if (v is None or v != v) else float(v) for v in ev_vals],
                    dtype=np.float64,
                )
            except (TypeError, ValueError):
                key = np.array(
                    ["" if (v is None or v != v) else str(v) for v in ev_vals], dtype=object
                )
        else:
            key = np.nan_to_num(ev_vals.astype(np.float64), nan=-np.inf)
        order = np.lexsort((key, ev_ts))
        ev_ts, ev_vals = ev_ts[order], ev_vals[order]
        if buckets is not None:
            buckets = buckets[order]
    if part.window is None:
        in_win = ev_ts < qt
    else:
        w, hop = part.window.millis, part.hop_millis
        tail = ((qt - w) // hop) * hop
        in_win = (ev_ts >= tail) & (ev_ts < qt)
    if part.bucket is not None:
        assert buckets is not None
        result = {}
        stripped = AggregationPart(part.input_column, part.operation, part.arg_map, part.window, None)
        mask_b = np.array([b is not None and b == b for b in buckets])
        for b in set(buckets[in_win & mask_b]):
            sel = in_win & mask_b & (buckets == b)
            v = _agg(stripped, ev_vals[sel])
            if v is not None:
                result[str(b)] = v
        return result or None
    return _agg(part, ev_vals[in_win])


def _agg(part: AggregationPart, vals: np.ndarray):
    # drop nulls (update-guard semantics); vals are in ts order
    if vals.dtype == object:
        mask = np.array([v is not None and v == v for v in vals], dtype=bool)
    else:
        mask = ~np.isnan(vals.astype(np.float64))
    vals = vals[mask]
    if len(vals) == 0:
        return None
    op = part.operation
    k = int(part.arg_map.get("k", 1))
    if op is Operation.COUNT:
        return len(vals)
    if op is Operation.SUM:
        return float(np.sum(vals.astype(np.float64)))
    if op is Operation.AVERAGE:
        return float(np.mean(vals.astype(np.float64)))
    if op is Operation.MIN:
        return vals.min()
    if op is Operation.MAX:
        return vals.max()
    if op is Operation.VARIANCE:
        return float(np.var(vals.astype(np.float64)))
    if op is Operation.SKEW:
        x = vals.astype(np.float64)
        n, m2 = len(x), np.var(x)
        if n < 3 or m2 <= 0:
            return float("nan")
        m3 = np.mean((x - x.mean()) ** 3)
        return float(m3 / m2**1.5)
    if op is Operation.KURTOSIS:
        x = vals.astype(np.float64)
        n, m2 = len(x), np.var(x)
        if n < 4 or m2 <= 0:
            return float("nan")
        m4 = np.mean((x - x.mean()) ** 4)
        return float(m4 / m2**2 - 3.0)
    if op is Operation.FIRST:
        return vals[0]
    if op is Operation.LAST:
        return vals[-1]
    if op is Operation.FIRST_K:
        return list(vals[:k])
    if op is Operation.LAST_K:
        return list(vals[-k:][::-1])
    if op is Operation.TOP_K:
        return list(np.sort(vals)[::-1][:k])
    if op is Operation.BOTTOM_K:
        return list(np.sort(vals)[:k])
    if op is Operation.UNIQUE_COUNT or op is Operation.APPROX_UNIQUE_COUNT:
        return len(np.unique(vals))
    if op is Operation.BOUNDED_UNIQUE_COUNT:
        return min(len(np.unique(vals)), k)
    if op is Operation.APPROX_PERCENTILE:
        qs = part.arg_map.get("percentiles", [0.5])
        return [float(np.percentile(vals.astype(np.float64), q * 100)) for q in qs]
    if op in (Operation.HISTOGRAM, Operation.APPROX_HISTOGRAM_K):
        uniq, counts = np.unique(vals.astype(str), return_counts=True)
        d = {str(u): int(c) for u, c in zip(uniq, counts)}
        kk = part.arg_map.get("k")
        if kk:
            d = dict(sorted(d.items(), key=lambda x: (-x[1], x[0]))[: int(kk)])
        return d
    raise ValueError(op)


def allclose_feature(a, b, rtol=1e-5, atol=1e-5) -> bool:
    """Tolerant comparison mirroring spark/Comparison.scala:105 (1e-5)."""
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, dict) or isinstance(b, dict):
        if set(a) != set(b):
            return False
        return all(allclose_feature(a[kk], b[kk], rtol, atol) for kk in a)
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        if len(a) != len(b):
            return False
        return all(allclose_feature(x, y, rtol, atol) for x, y in zip(a, b))
    if isinstance(a, (int, float, np.floating, np.integer)) and isinstance(
        b, (int, float, np.floating, np.integer)
    ):
        fa, fb = float(a), float(b)
        if np.isnan(fa) and np.isnan(fb):
            return True
        return bool(np.isclose(fa, fb, rtol=rtol, atol=atol))
    return a == b
