from chronon_spark.functions.aggregations import OP_SPECS, OpSpec, spec_for

__all__ = ["OP_SPECS", "OpSpec", "spec_for"]
