from chronon_spark.plans.ranges import PartitionRange, chunk_holes, unfilled_ranges

__all__ = ["PartitionRange", "chunk_holes", "unfilled_ranges"]
