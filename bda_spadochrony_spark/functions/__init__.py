from bda_spadochrony_spark.functions.temporal import with_date_hour, calendar_features, shift_timestamp
from bda_spadochrony_spark.functions.encode import one_hot, horizontal_sum

__all__ = ["with_date_hour", "calendar_features", "shift_timestamp", "one_hot", "horizontal_sum"]
