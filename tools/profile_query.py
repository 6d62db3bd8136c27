"""Per-operator profile of a registry query: executes it once and prints Ray
Data's execution stats (per-stage wall time, block counts, task counts) so
stage-level bottlenecks are measured, not guessed.

Usage: python tools/profile_query.py <query_name> [sf_dir]
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import pyarrow as pa

    from odibel_ray.pipelines.queries import QUERIES, ensure_transcript_log

    ensure_transcript_log(sf_dir)
    t0 = time.time()
    res = QUERIES[name](sf_dir)
    if isinstance(res, pa.Table):
        print(f"{name}: driver-composed result, {res.num_rows} rows, "
              f"{time.time() - t0:.2f}s (no single-pipeline stats)")
    else:
        mat = res.materialize()
        print(f"{name}: {mat.count()} rows in {time.time() - t0:.2f}s\n")
        print(mat.stats())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
