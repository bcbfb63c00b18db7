from bda_spadochrony_spark.operators.aggregates import group_agg, mode_by_struct_max, two_level_avg
from bda_spadochrony_spark.operators.joins import equi_join, interval_join
from bda_spadochrony_spark.operators.windows import range_frame_agg
from bda_spadochrony_spark.operators.sorts import sort_by

__all__ = [
    "group_agg", "mode_by_struct_max", "two_level_avg",
    "equi_join", "interval_join", "range_frame_agg", "sort_by",
]
