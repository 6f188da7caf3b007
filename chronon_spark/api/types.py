"""The user-facing config data model.

Plain-Python dataclasses carrying the same field *semantics* as the
reference's thrift structs (api/thrift/api.thrift:7-372 — Query, Source,
Aggregation, Window, GroupBy, Join), re-authored for a PySpark engine.
The engine interprets these configs; it never parses SQL beyond the
Spark-SQL expression strings embedded in ``Query.selects``/``wheres``.

Time contract (api.thrift comments + spark/GroupBy.scala:492-499):
the engine-internal time column ``ts`` is epoch **milliseconds** (long).
Partition column defaults to ``ds`` with format ``yyyy-MM-dd``.
"""

from __future__ import annotations

import enum
import hashlib
import json
from dataclasses import dataclass, field

MS_PER_HOUR = 3_600_000
MS_PER_DAY = 86_400_000
FIVE_MINUTES_MS = 300_000


class TimeUnit(enum.Enum):
    MINUTES = "m"
    HOURS = "h"
    DAYS = "d"

    @property
    def millis(self) -> int:
        return {"m": 60_000, "h": MS_PER_HOUR, "d": MS_PER_DAY}[self.value]


@dataclass(frozen=True)
class Window:
    """api/thrift/api.thrift:188-196. ``length`` in ``time_unit`` units."""

    length: int
    time_unit: TimeUnit = TimeUnit.DAYS

    @property
    def millis(self) -> int:
        return self.length * self.time_unit.millis

    @property
    def suffix(self) -> str:
        return f"{self.length}{self.time_unit.value}"

    @property
    def days_ceil(self) -> int:
        return -(-self.millis // MS_PER_DAY)


def sawtooth_hop_millis(window_millis: int) -> int:
    """Tail-hop resolution per window (windowing/Resolution.scala:37-47):
    windows >12d hop daily, >12h hop hourly, else every 5 minutes."""
    if window_millis > 12 * MS_PER_DAY:
        return MS_PER_DAY
    if window_millis > 12 * MS_PER_HOUR:
        return MS_PER_HOUR
    return FIVE_MINUTES_MS


class Operation(enum.Enum):
    # abelian-group ops (support deletion; api.thrift:155-185 comments)
    COUNT = "count"
    SUM = "sum"
    AVERAGE = "average"
    VARIANCE = "variance"
    SKEW = "skew"
    KURTOSIS = "kurtosis"
    HISTOGRAM = "histogram"
    # monoid ops
    MIN = "min"
    MAX = "max"
    FIRST = "first"
    LAST = "last"
    FIRST_K = "first_k"
    LAST_K = "last_k"
    TOP_K = "top_k"
    BOTTOM_K = "bottom_k"
    UNIQUE_COUNT = "unique_count"
    APPROX_UNIQUE_COUNT = "approx_unique_count"
    BOUNDED_UNIQUE_COUNT = "bounded_unique_count"
    APPROX_PERCENTILE = "approx_percentile"
    # exact map until k distinct values, then frequent-items truncation
    # (reference uses Yahoo ItemsSketch, SimpleAggregators.scala:459-601;
    # we use a deterministic mergeable Misra-Gries cap: day IRs keep the
    # top 8k entries by count plus a truncation-error sentinel, finalize
    # keeps top k — est ≤ true ≤ est + error_bound, the ItemsSketch
    # upper/lower-bound contract; bound 0 when no day truncates)
    APPROX_HISTOGRAM_K = "approx_histogram_k"

    @property
    def is_time_ordered(self) -> bool:
        return self in (Operation.FIRST, Operation.LAST, Operation.FIRST_K, Operation.LAST_K)


@dataclass(frozen=True)
class Aggregation:
    """api/thrift/api.thrift:202-235. Each (window × bucket) pair unpacks
    into one output column (api/.../Extensions.scala:187-212)."""

    input_column: str
    operation: Operation
    arg_map: dict = field(default_factory=dict)  # k= for *_K ops, percentiles=[...]
    windows: tuple[Window | None, ...] = (None,)  # None = unbounded
    buckets: tuple[str, ...] = ()  # bucket column names (string-typed)
    # api.thrift:229-234: when true and input_column is an array type, the
    # operation applies POSITION-wise across the arrays (e.g. AVERAGE over
    # [[1,2],[3,4]] → [2.0, 3.0]) — any op works on lists this way
    element_wise: bool = False

    def unpack(self) -> list["AggregationPart"]:
        windows = self.windows if self.windows else (None,)
        buckets: tuple[str | None, ...] = self.buckets if self.buckets else (None,)
        if self.element_wise and self.buckets:
            raise NotImplementedError(
                "element_wise + buckets on one Aggregation is not supported"
            )
        return [
            AggregationPart(
                self.input_column, self.operation, dict(self.arg_map), w, b,
                self.element_wise,
            )
            for b in buckets
            for w in windows
        ]


@dataclass(frozen=True)
class AggregationPart:
    """One unpacked (input, op, window, bucket) — one output column.

    Output naming contract (api/.../Extensions.scala:168-181):
    ``{input}_{op}[_{window}][_by_{bucket}]``, e.g.
    ``purchase_price_sum_30d_by_lang``.
    """

    input_column: str
    operation: Operation
    arg_map: dict
    window: Window | None
    bucket: str | None
    element_wise: bool = False

    @property
    def output_column(self) -> str:
        parts = [self.input_column, self.operation.value]
        if self.operation in (Operation.TOP_K, Operation.BOTTOM_K, Operation.FIRST_K, Operation.LAST_K):
            parts.append(str(self.arg_map.get("k", 1)))
        if self.window is not None:
            parts.append(self.window.suffix)
        if self.bucket is not None:
            parts.extend(["by", self.bucket])
        return "_".join(parts)

    @property
    def window_millis(self) -> int | None:
        return None if self.window is None else self.window.millis

    @property
    def hop_millis(self) -> int | None:
        return None if self.window is None else sawtooth_hop_millis(self.window.millis)


@dataclass(frozen=True)
class Query:
    """Row-level scan spec (api/thrift/api.thrift:7-17). ``selects`` maps
    output alias → Spark-SQL expression (None ⇒ passthrough column of the
    same name); ``wheres`` are AND-ed. Rendering mirrors
    api/.../QueryUtils.scala:20-57."""

    selects: dict[str, str | None] | None = None
    wheres: tuple[str, ...] = ()
    time_column: str | None = None  # expression yielding epoch-millis long
    start_partition: str | None = None
    end_partition: str | None = None
    partition_column: str = "ds"
    setups: tuple[str, ...] = ()


@dataclass(frozen=True)
class EventSource:
    """Immutable fact table (api.thrift:56-76)."""

    table: str
    query: Query = field(default_factory=Query)
    is_cumulative: bool = False
    topic: str | None = None


@dataclass(frozen=True)
class EntitySource:
    """Daily-snapshot dimension table (api.thrift:86-106). Mutation support
    deferred (SURVEY §2.3 temporal-entities)."""

    snapshot_table: str
    query: Query = field(default_factory=Query)
    mutation_table: str | None = None


@dataclass(frozen=True)
class JoinSource:
    """The output of another Join used as a GroupBy input — chaining
    (api.thrift:128-147; materialized by spark/GroupBy.scala:406-457
    replaceJoinSource). Behaves like an EventSource whose rows are the
    upstream join's output (carrying its left's ts/ds)."""

    join: "Join"
    query: Query = field(default_factory=Query)


Source = EventSource | EntitySource | JoinSource


class Accuracy(enum.Enum):
    """api.thrift:247-250. SNAPSHOT = values as of left partition midnight;
    TEMPORAL = values as of the exact millisecond ts."""

    SNAPSHOT = "snapshot"
    TEMPORAL = "temporal"


@dataclass(frozen=True)
class GroupBy:
    """The aggregation unit (api.thrift:296-312)."""

    name: str
    sources: tuple[Source, ...]
    key_columns: tuple[str, ...]
    aggregations: tuple[Aggregation, ...]
    accuracy: Accuracy | None = None  # None → inferred: TEMPORAL iff any topic set
    backfill_start_date: str | None = None
    derivations: dict[str, str] | None = None  # alias → sparkSql expr over outputs

    @property
    def inferred_accuracy(self) -> Accuracy:
        # api/.../Extensions.scala:478-486
        if self.accuracy is not None:
            return self.accuracy
        if any(isinstance(s, EventSource) and s.topic for s in self.sources):
            return Accuracy.TEMPORAL
        return Accuracy.SNAPSHOT

    @property
    def is_events(self) -> bool:
        return all(isinstance(s, (EventSource, JoinSource)) for s in self.sources)

    def unpacked(self) -> list[AggregationPart]:
        return [p for a in self.aggregations for p in a.unpack()]

    @property
    def max_window_millis(self) -> int | None:
        """None if any window unbounded (api/.../Extensions.scala:444-451)."""
        ms = 0
        for p in self.unpacked():
            if p.window is None:
                return None
            ms = max(ms, p.window.millis)
        return ms

    def semantic_hash(self) -> str:
        """md5 of semantics-only config — port of the invalidation idea in
        spark/SemanticHashUtils.scala:1-154."""
        blob = json.dumps(_plain(self), sort_keys=True, default=str)
        return hashlib.md5(blob.encode()).hexdigest()


@dataclass(frozen=True)
class JoinPart:
    """api.thrift:318-326. ``key_mapping``: left column → right key column.
    ``full_prefix_override``: set by the ExternalPart → synthetic-JoinPart
    rewrite so offline-computable external features keep the reference's
    ``ext_{source}`` column naming (Extensions.scala:1042-1051
    ExternalJoinPart)."""

    group_by: GroupBy
    key_mapping: dict[str, str] | None = None
    prefix: str | None = None
    full_prefix_override: str | None = None

    @property
    def full_prefix(self) -> str:
        if self.full_prefix_override:
            return self.full_prefix_override
        base = self.group_by.name.replace(".", "_")
        return f"{self.prefix}_{base}" if self.prefix else base

    def right_to_left(self) -> dict[str, str]:
        mapping = self.key_mapping or {}
        inverse = {v: k for k, v in mapping.items()}
        return {k: inverse.get(k, k) for k in self.group_by.key_columns}


@dataclass(frozen=True)
class ExternalSource:
    """api.thrift:119-126 ExternalSource: a serving-time feature source
    the warehouse cannot compute (a model server, an RPC service, request
    context). ``key_schema``/``value_schema`` map column name → Spark DDL
    type string. ``offline_group_by``, when set, makes the part
    offline-computable — the backfill rewrites it to a synthetic JoinPart
    (Extensions.scala:1042-1051); without it the part is online-only and
    backfills null-padded (BootstrapInfo.scala:123-130)."""

    name: str
    key_schema: dict[str, str]
    value_schema: dict[str, str]
    offline_group_by: "GroupBy | None" = None


# the reference's Constants.ContextualSourceName: a pseudo external source
# whose "features" are the request-context fields themselves
CONTEXTUAL_SOURCE = "contextual"


@dataclass(frozen=True)
class ExternalPart:
    """api.thrift:320-326 ExternalPart. ``key_mapping``: left column →
    source key column. Output columns are named
    ``ext_[{prefix}_]{source}_{value_col}`` (Extensions.scala:708-748
    ExternalPartOps.fullName / valueSchemaFull)."""

    source: ExternalSource
    key_mapping: dict[str, str] | None = None
    prefix: str | None = None

    @property
    def full_name(self) -> str:
        base = self.source.name.replace(".", "_").replace("-", "_")
        pre = f"{self.prefix}_" if self.prefix else ""
        return f"ext_{pre}{base}"

    def value_columns(self) -> dict[str, str]:
        """{output column: Spark DDL type} for this part's features."""
        return {
            f"{self.full_name}_{c}": t for c, t in self.source.value_schema.items()
        }

    def left_key_columns(self) -> list[str]:
        """Left-side columns the part's keys read (key_mapping applied)."""
        inverse = {v: k for k, v in (self.key_mapping or {}).items()}
        return [inverse.get(k, k) for k in self.source.key_schema]


@dataclass(frozen=True)
class BootstrapPart:
    """Precomputed feature table seeded onto the left before part
    computation (api.thrift:314-326 BootstrapPart); existing values win
    over computed ones (spark/JoinUtils.scala:138-169 coalesce rule)."""

    table: str
    key_columns: tuple[str, ...]  # join columns present in both left and table


@dataclass(frozen=True)
class LabelPart:
    """Forward-looking labels (api.thrift:368-372 LabelPart): the label
    GroupBy evaluated ``offset`` days after each feature row's ds."""

    group_by: "GroupBy"
    label_offsets: tuple[int, ...] = (7,)
    prefix: str = "label"


@dataclass(frozen=True)
class Join:
    """Point-in-time enrichment (api.thrift:335-372): for every left row
    (keys, ts, ds) attach each GroupBy's aggregate **as of** that row's
    time with zero leakage."""

    name: str
    left: Source
    right_parts: tuple[JoinPart, ...]
    skew_keys: dict[str, tuple[str, ...]] | None = None
    derivations: dict[str, str] | None = None
    bootstrap_parts: tuple[BootstrapPart, ...] = ()
    label_part: "LabelPart | None" = None
    # api.thrift:341 onlineExternalParts: serving-time feature sources.
    # Offline, online-only parts land in the output schema null-padded
    # (bootstrap tables with logged values fill them via the fold's
    # coalesce); parts whose source carries offline_group_by compute as
    # synthetic join parts under the ext_ naming.
    online_external_parts: "tuple[ExternalPart, ...]" = ()

    def semantic_hash(self) -> str:
        blob = json.dumps(_plain(self), sort_keys=True, default=str)
        return hashlib.md5(blob.encode()).hexdigest()


def _plain(obj):
    """Recursively turn dataclasses/enums into JSON-able structures."""
    import dataclasses

    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _plain(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, enum.Enum):
        return obj.value
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj
