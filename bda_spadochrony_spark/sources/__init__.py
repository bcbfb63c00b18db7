from bda_spadochrony_spark.sources.readers import scan, conform, union_by_name
from bda_spadochrony_spark.sources.writers import write_parquet, write_serving_table

__all__ = ["scan", "conform", "union_by_name", "write_parquet", "write_serving_table"]
