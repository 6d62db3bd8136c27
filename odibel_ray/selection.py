"""Data-selection primitives for training-corpus construction.

DSIR-style importance weighting (Xie et al. 2023, *Data Selection for
Language Models via Importance Resampling*): score every raw document by the
log-likelihood ratio of its n-grams under a target-domain gram distribution
vs the raw-corpus gram distribution, then keep/resample by weight.

Reference parity: the reference has no selection stage — this extends its
profile-evaluator family (``evaluation/MetadataEvaluator.scala``-style corpus
statistics) to the standard pre-training data-selection signal.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

from odibel_ray.dedup import _collapse_doc_grams, _shingle_hashes_flat

__all__ = ["dsir_logweights", "gram_counts"]


def gram_counts(
    ds: "ray.data.Dataset",
    *,
    n: int = 2,
    text_col: str = "text",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Corpus-wide token-n-gram position counts as ``(gram_key, cnt)``.

    Grams are rolling hashes over the flat token-hash stream (equal token
    windows ⇒ equal key; no gram text leaves the task). Each batch collapses
    to its distinct grams BEFORE the shuffle — the groupby exchange moves one
    row per (batch, distinct gram), never one per position.
    """
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        gh, _ = _shingle_hashes_flat(t[text_col], n)
        if len(gh) == 0:
            return pa.table({"gram_key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        keys, cnt = np.unique(gh, return_counts=True)
        return pa.table({"gram_key": pa.array(keys.view(np.int64), pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    partial = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    return partial.groupby("gram_key").aggregate(Sum("cnt", alias_name="cnt"))


def dsir_logweights(
    raw: "ray.data.Dataset",
    target: "ray.data.Dataset",
    *,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
    num_buckets: int | None = None,
    batch_size: int = 65536,
    id_type: pa.DataType | None = None,
) -> "ray.data.Dataset":
    """Per-raw-doc DSIR log importance weight over token n-grams.

    ``log_w(d) = Σ_positions  ln p̂_target(g) − ln p̂_raw(g)`` with add-α
    (Laplace) smoothing over the UNION gram vocabulary:
    ``p̂(g) = (c(g) + α) / (T + αV)`` where ``T`` is the corpus's total gram
    positions and ``V`` the union vocabulary size. Returns one row per raw
    doc with ≥ n tokens: ``(id_col, n_grams, log_w)``.

    This is the exact-vocabulary formulation of DSIR: the paper's fixed-size
    hashed feature buckets are the lossy-compression special case (bucket =
    ``gram_key % m``); here the likelihood-ratio model is a DISTRIBUTED
    dataset keyed by gram, so nothing vocabulary-sized is ever broadcast or
    held on the driver — the model meets the documents in the same
    hash-bucketed join used for every other gram-keyed op. Scale shape:

    1. two ``gram_counts`` passes (per-batch combiners, one groupby each);
    2. a full-outer merge of the two count tables on ``gram_key`` (one
       bucketed exchange) → per-gram log-ratio rows; totals (T_t, T_r, V)
       are three scalar aggregates over that small-relative-to-corpus table;
    3. raw docs emit per-(doc, gram) position counts (same combiner as
       :func:`odibel_ray.dedup.cross_doc_ngram_dup`);
    4. one bucketed join of the doc-gram rows against the ratio table, then
       ``groupby(doc).sum`` of ``n_pos · log_ratio``.
    """
    from ray.data.aggregate import Sum

    from odibel_ray.ops.relational import bucketed_join

    if id_type is None:
        id_type = pa.int64()

    tc = gram_counts(target, n=n, text_col=text_col, batch_size=batch_size)
    rc = gram_counts(raw, n=n, text_col=text_col, batch_size=batch_size)

    vocab = bucketed_join(
        tc, rc, on="gram_key", how="outer", num_buckets=num_buckets,
        suffix="_r",
        left_schema=pa.schema([("gram_key", pa.int64()), ("cnt", pa.int64())]),
        right_schema=pa.schema([("gram_key", pa.int64()), ("cnt", pa.int64())]),
    ).map_batches(
        lambda t: pa.table({
            "gram_key": t["gram_key"],
            "ct": pc.coalesce(t["cnt"], pa.scalar(0, pa.int64())),
            "cr": pc.coalesce(t["cnt_r"], pa.scalar(0, pa.int64())),
        }),
        batch_format="pyarrow",
    ).materialize()  # vocabulary-sized (one row per distinct gram), reused 2×

    totals = vocab.aggregate(Sum("ct"), Sum("cr")) or {}
    t_tot = float(totals.get("sum(ct)") or 0)
    r_tot = float(totals.get("sum(cr)") or 0)
    v_size = float(vocab.count())
    a = float(smoothing)
    denom_t = np.log(t_tot + a * v_size) if v_size else 0.0
    denom_r = np.log(r_tot + a * v_size) if v_size else 0.0

    def _ratio(t: pa.Table) -> pa.Table:
        ct = t["ct"].to_numpy(zero_copy_only=False).astype(np.float64)
        cr = t["cr"].to_numpy(zero_copy_only=False).astype(np.float64)
        lw = (np.log(ct + a) - denom_t) - (np.log(cr + a) - denom_r)
        return pa.table({"gram_key": t["gram_key"], "lw": pa.array(lw)})

    ratios = vocab.map_batches(_ratio, batch_format="pyarrow", batch_size=batch_size)

    def _doc_grams(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        gh, offs = _shingle_hashes_flat(t[text_col], n)
        lens = np.diff(offs)
        if len(gh) == 0:
            return pa.table({"gram_key": pa.array([], pa.int64()),
                             id_col: pa.array([], id_type),
                             "n_pos": pa.array([], pa.int64())})
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        flat_firsts, counts = _collapse_doc_grams(doc_idx, gh)
        return pa.table({
            "gram_key": pa.array(gh[flat_firsts].view(np.int64), pa.int64()),
            id_col: t[id_col].take(pa.array(doc_idx[flat_firsts])),
            "n_pos": pa.array(counts, pa.int64()),
        })

    doc_grams = raw.map_batches(_doc_grams, batch_format="pyarrow",
                                batch_size=batch_size)
    scored = bucketed_join(
        doc_grams, ratios, on="gram_key", how="left", num_buckets=num_buckets,
        left_schema=pa.schema([("gram_key", pa.int64()), (id_col, id_type),
                               ("n_pos", pa.int64())]),
        right_schema=pa.schema([("gram_key", pa.int64()), ("lw", pa.float64())]),
    )

    def _contrib(t: pa.Table) -> pa.Table:
        npos = t["n_pos"].to_numpy(zero_copy_only=False).astype(np.float64)
        # every raw gram is in the union vocab by construction; coalesce is
        # pure defence against an empty-target degenerate run
        lw = pc.coalesce(t["lw"], pa.scalar(0.0)).to_numpy(zero_copy_only=False)
        return pa.table({id_col: t[id_col], "n_pos": t["n_pos"],
                         "contrib": pa.array(npos * lw)})

    per_doc = (
        scored.map_batches(_contrib, batch_format="pyarrow", batch_size=batch_size)
        .groupby(id_col)
        .aggregate(Sum("n_pos", alias_name="n_grams"),
                   Sum("contrib", alias_name="log_w"))
    )
    return per_doc.map_batches(
        lambda t: t.select([id_col, "n_grams", "log_w"]), batch_format="pyarrow"
    )
