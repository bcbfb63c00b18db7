from bda_spadochrony_spark.plans.pipelines import (hourly_rollup, weather_hourly,
                                                   stock_hourly, traffic_hourly)
from bda_spadochrony_spark.plans.stream_fused import fused_stream_join

__all__ = ["hourly_rollup", "weather_hourly", "stock_hourly",
           "traffic_hourly", "fused_stream_join"]
