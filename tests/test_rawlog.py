"""S1 raw-log splitter: multi-line record assembly (WikiDumpFlatter
line-state machine), codec autodetect, field enrichment, and the round trip
into the CDC replay pipeline."""

import gzip

import pyarrow as pa
import pyarrow.parquet as pq

from odibel_ray.sources.rawlog import (
    RecordSplitter,
    parse_page_revisions,
    read_split_records,
)

PAGE_A = """<page>
    <title>Alpha</title>
    <ns>0</ns>
    <id>1</id>
    <revision>
      <id>11</id>
      <timestamp>2024-01-01T00:00:00Z</timestamp>
      <text>alpha v1</text>
    </revision>
    <revision>
      <id>12</id>
      <timestamp>2024-01-02T00:00:00Z</timestamp>
      <text>alpha v2</text>
    </revision>
  </page>"""

PAGE_B = """<page>
    <title>Beta</title>
    <ns>0</ns>
    <id>2</id>
    <revision>
      <id>21</id>
      <timestamp>2024-01-03T00:00:00Z</timestamp>
      <text>beta v1</text>
    </revision>
  </page>"""


def test_state_machine_shares_header_and_resets():
    sm = RecordSplitter()
    recs = [r for line in PAGE_A.splitlines() if (r := sm.feed(line))]
    assert len(recs) == 2
    # both revisions carry the page header; header cleared at </page>
    assert "<title>Alpha</title>" in recs[0][0]
    assert recs[0][0] == recs[1][0]
    assert "alpha v1" in recs[0][1] and "alpha v2" in recs[1][1]
    assert "alpha v1" not in recs[1][1]  # body buffer reset between records
    assert sm.feed("<page>") is None  # header cleared for the next page
    assert sm._header == []


def test_read_split_records_multi_file_and_codec(ray_session, tmp_path):
    (tmp_path / "dump-0.xml").write_text(PAGE_A + "\n")
    with gzip.open(tmp_path / "dump-1.xml.gz", "wt") as f:
        f.write(PAGE_B + "\n")
    ds = read_split_records(str(tmp_path))
    t = pa.Table.from_pandas(ds.to_pandas()).sort_by(
        [("path", "ascending"), ("record_idx", "ascending")]
    )
    assert t.num_rows == 3
    assert t["record_idx"].to_pylist() == [0, 1, 0]
    parsed = parse_page_revisions(ds).to_pandas().sort_values("revision_id")
    assert parsed["page_title"].tolist() == ["Alpha", "Alpha", "Beta"]
    assert parsed["page_id"].tolist() == [1, 1, 2]
    assert parsed["revision_id"].tolist() == [11, 12, 21]
    assert parsed["revision_ts"].iloc[0] == "2024-01-01T00:00:00Z"


def test_rawlog_feeds_replay(ray_session, tmp_path):
    """Dump fixture → split → enrich → change-log events → replay_dataset:
    the converged table keeps the latest revision per page (LWW)."""
    import numpy as np

    from odibel_ray.cdc.apply import replay_dataset

    (tmp_path / "dump.xml").write_text(PAGE_A + "\n" + PAGE_B + "\n")
    parsed = parse_page_revisions(read_split_records(str(tmp_path / "dump.xml")))

    def to_events(t: pa.Table) -> pa.Table:
        n = len(t)
        import pyarrow.compute as pc

        ts = pc.cast(
            pc.strptime(t["revision_ts"], format="%Y-%m-%dT%H:%M:%SZ", unit="us"),
            pa.timestamp("us"),
        )
        return pa.table(
            {
                "op": pa.array(["I"] * n, pa.string()),
                "lsn": pc.cast(t["revision_id"], pa.int64()),
                "conv_id": pc.cast(t["page_title"], pa.string()),
                "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
                "role": pa.array(["user"] * n, pa.string()),
                "text": pc.cast(t["body"], pa.string()),
                "tool": pa.nulls(n, pa.string()),
                "tool_name": pa.nulls(n, pa.string()),
                "score": pa.nulls(n, pa.float64()),
                "ts": ts,
                "schema_change": pa.nulls(n, pa.string()),
            }
        )

    log_dir = tmp_path / "change_log" / "part=0"
    log_dir.mkdir(parents=True)
    events = pa.concat_tables(
        [
            to_events(b)
            for b in parsed.iter_batches(batch_format="pyarrow")
            if len(b)
        ]
    )
    pq.write_table(events, log_dir / "log-0.parquet")

    final = replay_dataset(str(tmp_path / "change_log")).to_pandas()
    assert len(final) == 2  # one converged row per page
    by_conv = dict(zip(final["conv_id"], final["text"]))
    assert "alpha v2" in by_conv["Alpha"]  # LWW kept the later revision
    assert "beta v1" in by_conv["Beta"]
