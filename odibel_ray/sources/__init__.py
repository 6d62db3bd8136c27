from odibel_ray.sources.io import (
    csv_to_parquet,
    json_to_parquet,
    parquet_to_csv,
    read_table_auto,
)

__all__ = ["csv_to_parquet", "json_to_parquet", "parquet_to_csv", "read_table_auto"]
