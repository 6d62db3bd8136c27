"""Raw multi-line record splitter (SURVEY.md §2.1 S1) — the reference's
wiki-dump flattener (``utils/WikiDumpFlatter.scala:39-82`` and
``utils/WikiUtil.scala:66-97`` ``splitToItem``) rebuilt Ray-Data-first.

The reference streams a dump file line by line through a state machine:
``<page>`` starts header accumulation, ``<revision>`` switches to record
accumulation, ``</revision>`` emits one (header, record) pair — so every
revision of a page carries that page's header — and ``</page>`` clears the
header. Records therefore span many lines and several records share state
(the page header), which a per-block ``read_text`` transform cannot express.

Scale shape: one streaming task per *file* (the dump's natural shard — the
reference also processes file-at-a-time). Files parallelize across the
cluster; within a file the state machine streams line-by-line with O(record)
memory and yields Arrow batches of ``batch_rows`` records, so a multi-GB
dump shard never materializes. Partitioning assumption (documented contract):
a record never spans files.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Iterator, Optional, Tuple

import pyarrow as pa

from odibel_ray.sources.io import detect_codec

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


class RecordSplitter:
    """The ``splitToItem`` line-state machine, marker-configurable.

    ``feed(line)`` returns a ``(header, body)`` pair when ``record_close``
    completes a record, else ``None``. Lines are matched on their stripped
    form (the reference matches ``line.trim``) but accumulated verbatim with
    a trailing newline, exactly as the reference's ``StringBuilder``s do.
    """

    def __init__(
        self,
        header_open: str = "<page>",
        header_close: str = "</page>",
        record_open: str = "<revision>",
        record_close: str = "</revision>",
    ):
        self.header_open = header_open
        self.header_close = header_close
        self.record_open = record_open
        self.record_close = record_close
        self._header: list[str] = []
        self._body: list[str] = []
        self._in_header = False
        self._in_record = False

    def feed(self, line: str) -> Optional[Tuple[str, str]]:
        stripped = line.strip()
        if stripped == self.header_open:
            self._in_header = True
            return None
        if stripped == self.header_close:
            self._header.clear()
            return None
        if stripped == self.record_open:
            self._in_header = False
            self._in_record = True
            return None
        if stripped == self.record_close:
            self._in_record = False
            body = "".join(self._body)
            self._body.clear()
            return ("".join(self._header), body)
        if self._in_header:
            self._header.append(line + "\n")
        elif self._in_record:
            self._body.append(line + "\n")
        return None


def _open_lines(path: str) -> Iterator[str]:
    """Stream decoded lines (without terminators) with codec autodetection —
    the S4 extension dispatch applied to a raw byte stream."""
    codec, _ = detect_codec(path)
    if codec == "gzip":
        import gzip

        f = gzip.open(path, "rt", encoding="utf-8", errors="replace")
    elif codec == "bz2":
        import bz2

        f = bz2.open(path, "rt", encoding="utf-8", errors="replace")
    elif codec == "zstd":
        stream = pa.CompressedInputStream(pa.OSFile(path, "rb"), "zstd")
        import io

        f = io.TextIOWrapper(stream, encoding="utf-8", errors="replace")
    else:
        f = open(path, "rt", encoding="utf-8", errors="replace")
    with f:
        for line in f:
            yield line.rstrip("\r\n")


def split_records_file(
    path: str,
    splitter: Optional[RecordSplitter] = None,
    *,
    batch_rows: int = 1024,
) -> Iterator[pa.Table]:
    """One file → Arrow batches ``(path, record_idx, header, body)``; the
    per-file streaming kernel behind :func:`read_split_records`."""
    sm = splitter or RecordSplitter()
    headers: list[str] = []
    bodies: list[str] = []
    idx0 = 0

    def flush(n0: int, h: list, b: list) -> pa.Table:
        n = len(h)
        return pa.table(
            {
                "path": pa.array([path] * n, pa.string()),
                "record_idx": pa.array(range(n0, n0 + n), pa.int64()),
                "header": pa.array(h, pa.string()),
                "body": pa.array(b, pa.string()),
            }
        )

    for line in _open_lines(path):
        rec = sm.feed(line)
        if rec is not None:
            headers.append(rec[0])
            bodies.append(rec[1])
            if len(headers) >= batch_rows:
                yield flush(idx0, headers, bodies)
                idx0 += len(headers)
                headers, bodies = [], []
    if headers:
        yield flush(idx0, headers, bodies)


def _expand(paths) -> list[str]:
    import glob as _glob

    out: list[str] = []
    for p in [paths] if isinstance(paths, str) else list(paths):
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if os.path.isfile(os.path.join(p, f))
            )
        elif any(c in p for c in "*?["):
            out.extend(sorted(_glob.glob(p)))
        else:
            out.append(p)
    return out


def read_split_records(
    paths,
    splitter_factory=RecordSplitter,
    *,
    batch_rows: int = 1024,
) -> "ray.data.Dataset":
    """S1 source: raw multi-line dump files → Dataset
    ``(path, record_idx, header, body)``, one record per header+body pair.

    One task per file (``map_batches`` over a file-descriptor Dataset with
    ``batch_size=1``); each task streams its file through a fresh
    ``splitter_factory()`` state machine and *yields* record batches, so task
    memory stays O(``batch_rows`` records) regardless of file size.
    """
    import ray.data as rd

    files = _expand(paths)
    if not files:
        raise FileNotFoundError(f"no input files match {paths!r}")

    def split(batch: pa.Table) -> Iterator[pa.Table]:
        emitted = False
        for p in batch["path"].to_pylist():
            for t in split_records_file(p, splitter_factory(), batch_rows=batch_rows):
                emitted = True
                yield t
        if not emitted:  # keep the operator's schema stable on empty files
            yield pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "record_idx": pa.array([], pa.int64()),
                    "header": pa.array([], pa.string()),
                    "body": pa.array([], pa.string()),
                }
            )

    return rd.from_items([{"path": p} for p in files]).map_batches(
        split, batch_format="pyarrow", batch_size=1
    )


_XML_FIELDS = {
    "page_title": r"<title>(?P<v>.*?)</title>",
    "page_id": r"<id>(?P<v>\d+)</id>",
    "page_ns": r"<ns>(?P<v>\d+)</ns>",
}
_REV_FIELDS = {
    "revision_id": r"<id>(?P<v>\d+)</id>",
    "revision_ts": r"<timestamp>(?P<v>.*?)</timestamp>",
}


def parse_page_revisions(records: "ray.data.Dataset") -> "ray.data.Dataset":
    """M1-style enrich of split records (``WikiUtil.scala:66-97``
    ``enrichFlatRawPageRevision``): pull page title/id/ns from the header and
    revision id/timestamp from the body with vectorized regex extraction.
    Returns ``(path, record_idx, page_title, page_id, page_ns, revision_id,
    revision_ts, body)``; missing fields are null, never an exception (the
    dump is untrusted input)."""
    import pyarrow.compute as pc

    def enrich(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        cols: dict = {"path": t["path"], "record_idx": t["record_idx"]}

        def extract(src, pattern: str):
            hit = pc.extract_regex(src, pattern)
            return pc.struct_field(hit, ["v"])

        hdr, body = t["header"], t["body"]
        cols["page_title"] = extract(hdr, _XML_FIELDS["page_title"])
        cols["page_id"] = pc.cast(extract(hdr, _XML_FIELDS["page_id"]), pa.int64())
        cols["page_ns"] = pc.cast(extract(hdr, _XML_FIELDS["page_ns"]), pa.int64())
        cols["revision_id"] = pc.cast(
            extract(body, _REV_FIELDS["revision_id"]), pa.int64()
        )
        cols["revision_ts"] = extract(body, _REV_FIELDS["revision_ts"])
        cols["body"] = body
        return pa.table(cols)

    return records.map_batches(enrich, batch_format="pyarrow")
