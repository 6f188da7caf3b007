from chronon_spark.operators.groupby import group_by_backfill, snapshot_events
from chronon_spark.operators.temporal import temporal_events

__all__ = ["group_by_backfill", "snapshot_events", "temporal_events"]
