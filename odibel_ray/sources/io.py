"""Format converters with row-count audit (SURVEY.md §2.1 S5/S6/S8) and
compression-codec autodetection (S4).

The reference's ``CSVToParquet`` audits row counts before/after conversion
(``/root/reference/src/main/scala/ai/scads/odibel/transform/CSVToParquet.scala:25-30``)
— generalized here: every converter counts input and output rows via streaming
aggregates and raises on mismatch. Formats: csv | json(l) | parquet.

Codec detection follows the reference's extension dispatch on raw streams
(``main/DBpediaTKG.scala:106-133``, ``utils/HDFSUtil.scala:23-43``): a
trailing ``.gz``/``.bz2``/``.zst`` selects the decompression codec and the
next extension selects the format (``corpus.nt.gz`` → gzip-compressed
N-Triples). Parquet is self-describing and never needs a codec suffix.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


class AuditError(RuntimeError):
    pass


#: codec-suffix → Arrow CompressedInputStream codec name
CODEC_EXTENSIONS = {"gz": "gzip", "gzip": "gzip", "bz2": "bz2", "zst": "zstd"}


def detect_codec(path: str) -> tuple[str | None, str]:
    """(codec, path-without-codec-suffix) from the extension chain."""
    base, ext = os.path.splitext(path)
    codec = CODEC_EXTENSIONS.get(ext.lstrip(".").lower())
    return (codec, base) if codec else (None, path)


def read_text_auto(path: str) -> "ray.data.Dataset":
    """``read_text`` with codec autodetection — the raw-stream source shape
    (S4) used by line-oriented readers (N-Triples, logs)."""
    import ray.data as rd

    codec, _ = detect_codec(path)
    if codec:
        return rd.read_text(path, arrow_open_stream_args={"compression": codec})
    return rd.read_text(path)


def _read(path: str, fmt: str):
    import ray.data as rd

    if fmt == "csv":
        return rd.read_csv(path)
    if fmt == "json":
        return rd.read_json(path)
    if fmt == "parquet":
        return rd.read_parquet(path)
    raise ValueError(f"unknown format {fmt}")


def _convert(in_path: str, in_fmt: str, out_dir: str, out_fmt: str) -> dict:
    ds = _read(in_path, in_fmt)
    n_in = ds.count()
    os.makedirs(out_dir, exist_ok=True)
    ds = _read(in_path, in_fmt)  # fresh lazy plan for the write pass
    if out_fmt == "csv":
        ds.write_csv(out_dir)
    elif out_fmt == "json":
        ds.write_json(out_dir)
    else:
        ds.write_parquet(out_dir)
    n_out = _read(out_dir, out_fmt).count()
    if n_in != n_out:  # the CSVToParquet audit, generalized
        raise AuditError(f"row-count audit failed: in={n_in} out={n_out}")
    return {"rows": n_in, "out_dir": out_dir, "format": out_fmt}


def csv_to_parquet(in_path: str, out_dir: str) -> dict:
    return _convert(in_path, "csv", out_dir, "parquet")


def parquet_to_csv(in_path: str, out_dir: str) -> dict:
    return _convert(in_path, "parquet", out_dir, "csv")


def json_to_parquet(in_path: str, out_dir: str) -> dict:
    return _convert(in_path, "json", out_dir, "parquet")


def _read_whole_file_format(path: str, decode, extensions) -> "ray.data.Dataset":
    """Per-file task-based reader for formats Ray Data has no native source
    for: one streaming task per file (the rawlog shape) — the file payload
    moves through the object store once and decodes inside the task, so
    parallelism scales with file count and nothing is materialized on the
    driver. Directory reads keep only ``extensions`` files (a single-file
    path is read regardless of its name)."""
    import ray.data as rd

    def _decode(t: pa.Table) -> pa.Table:
        tables = [decode(pa.BufferReader(bytes(b))) for b in t["bytes"].to_pylist()]
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")

    exts = None if os.path.isfile(path) else list(extensions)
    return rd.read_binary_files(path, file_extensions=exts).map_batches(
        _decode, batch_format="pyarrow", batch_size=None
    )


def read_orc(path: str) -> "ray.data.Dataset":
    """ORC source (one task per file)."""
    from pyarrow import orc

    return _read_whole_file_format(
        path, lambda buf: orc.ORCFile(buf).read(), ["orc"]
    )


def read_feather(path: str) -> "ray.data.Dataset":
    """Feather / Arrow-IPC source (one task per file)."""
    from pyarrow import feather

    return _read_whole_file_format(
        path, feather.read_table, ["feather", "arrow", "ipc"]
    )


def orc_to_parquet(in_path: str, out_dir: str) -> dict:
    """ORC → Parquet with the converter row-count audit."""
    n_in = read_orc(in_path).count()
    os.makedirs(out_dir, exist_ok=True)
    read_orc(in_path).write_parquet(out_dir)
    n_out = _read(out_dir, "parquet").count()
    if n_in != n_out:
        raise AuditError(f"row-count audit failed: in={n_in} out={n_out}")
    return {"rows": n_in, "out_dir": out_dir, "format": "parquet"}


def read_table_auto(path: str):
    """Reader registry by extension chain with codec autodetect (§2.10, S4):
    ``table.csv.gz`` → gzip codec + csv format."""
    import ray.data as rd

    codec, stripped = detect_codec(path)
    ext = os.path.splitext(stripped)[1].lstrip(".").lower() or "parquet"
    fmt = {"csv": "csv", "json": "json", "jsonl": "json", "parquet": "parquet"}.get(ext)
    if fmt is None:
        if ext == "orc":
            return read_orc(path)
        if ext in ("feather", "arrow", "ipc"):
            return read_feather(path)
        raise ValueError(f"unsupported extension: {path}")
    if codec:
        if fmt == "parquet":
            raise ValueError("parquet is internally compressed; no codec suffix expected")
        args = {"arrow_open_stream_args": {"compression": codec}}
        return rd.read_csv(path, **args) if fmt == "csv" else rd.read_json(path, **args)
    return _read(path, fmt)
