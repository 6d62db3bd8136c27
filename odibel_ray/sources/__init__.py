from odibel_ray.sources.gradoop import (
    gradoop_clusters,
    read_gradoop_edges,
    read_gradoop_vertices,
)
from odibel_ray.sources.io import (
    csv_to_parquet,
    detect_codec,
    json_to_parquet,
    orc_to_parquet,
    parquet_to_csv,
    read_feather,
    read_orc,
    read_table_auto,
    read_text_auto,
)
from odibel_ray.sources.stream import open_stream, spool_jsonl, tail_stream

__all__ = [
    "csv_to_parquet",
    "detect_codec",
    "json_to_parquet",
    "orc_to_parquet",
    "parquet_to_csv",
    "read_feather",
    "read_orc",
    "read_table_auto",
    "read_text_auto",
    "read_gradoop_vertices",
    "read_gradoop_edges",
    "gradoop_clusters",
    "open_stream",
    "spool_jsonl",
    "tail_stream",
]
