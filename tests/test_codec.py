"""ODIBEL_PARQUET_CODEC: one knob for every sink data-file write.

The knob is read inside the writing task, so it must be set in the session's
environment BEFORE ``ray.init`` (i.e. on the job submission:
``ODIBEL_PARQUET_CODEC=zstd ray job submit ...``) — hence the zstd leg runs
in a fresh subprocess."""

import glob
import os
import subprocess
import sys

import pyarrow.parquet as pq

from odibel_ray.cdc import replay_publish
from odibel_ray.oracle import replay_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _first_codec(out_dir: str) -> str:
    f = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))[0]
    return pq.ParquetFile(f).metadata.row_group(0).column(0).compression


def test_sink_codec_default_snappy(ray_session, small_log, tmp_path):
    t1 = str(tmp_path / "t_snappy")
    replay_publish(small_log["log_dir"], t1, num_buckets=4, run_id="c1")
    assert _first_codec(t1) == "SNAPPY"


def test_sink_codec_zstd_fresh_session(small_log, tmp_path):
    t2 = str(tmp_path / "t_zstd")
    script = f"""
import ray; ray.init(address="local", num_cpus=2, include_dashboard=False,
                     logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from odibel_ray.cdc import replay_publish, read_published
replay_publish({small_log["log_dir"]!r}, {t2!r}, num_buckets=4, run_id="c2")
print("ROWS", read_published({t2!r}).count())
ray.shutdown()
"""
    env = {**os.environ, "ODIBEL_PARQUET_CODEC": "zstd",
           "PYTHONPATH": REPO, "RAY_ADDRESS": ""}
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    assert _first_codec(t2) == "ZSTD"
    rows = int([l for l in out.stdout.splitlines() if l.startswith("ROWS")][0].split()[1])
    assert rows == replay_oracle(small_log["log_dir"]).num_rows
