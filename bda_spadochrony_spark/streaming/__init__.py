from bda_spadochrony_spark.streaming.sources import file_stream, rate_stream
from bda_spadochrony_spark.streaming.ops import (with_watermark, stream_dedup,
                                                 stream_interval_join, windowed_agg)
from bda_spadochrony_spark.streaming.runner import (run_to_memory, run_foreach_batch,
                                                    run_available_now)

__all__ = ["file_stream", "rate_stream", "with_watermark", "stream_dedup",
           "stream_interval_join", "windowed_agg", "run_to_memory",
           "run_foreach_batch", "run_available_now"]
