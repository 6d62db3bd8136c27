"""Corpus-trained n-gram language-model scoring — CCNet-style perplexity
filtering (Wenzek et al. 2020, *CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data*).

CCNet's quality signal is the perplexity of each document under a language
model trained on a trusted reference corpus; documents are then binned into
``head`` / ``middle`` / ``tail`` by per-language perplexity terciles. Here
the LM is a **bigram stupid-backoff model** (Brants et al. 2007, *Large
Language Models in Machine Translation*) — the inherently-distributed n-gram
family: the model IS a gram-keyed count table, so training is two
combiner-first ``groupby`` passes and scoring is two hash-bucketed joins.
Nothing vocabulary-sized is ever broadcast or held on the driver.

Scoring rule (natural log; ``a`` = add-a smoothing, ``bo`` = backoff factor):

- position 0:        ``S(w0) = ln (c(w0)+a) − ln (T + aV)``
- position i ≥ 1:    ``S(wi | wi-1) = ln c(wi-1 wi) − ln c(wi-1)`` when the
  bigram was seen in training, else ``ln bo + ln (c(wi)+a) − ln (T + aV)``
- ``logprob(d) = Σ S``, ``ppl(d) = exp(−logprob/n_tokens)``.

Tokens are whitespace tokens; gram identity is the same rolling token-hash
used by every other gram-keyed op (:func:`odibel_ray.dedup._shingle_hashes_flat`)
— equal token windows ⇒ equal key, and no gram text ever leaves a task.

Reference parity: the reference has no LM stage — this extends its profile
evaluators (``evaluation/MetadataEvaluator.scala``) with the standard
web-corpus quality signal, alongside :mod:`odibel_ray.selection` (DSIR).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

from odibel_ray.dedup import (
    _MIX,
    _collapse_doc_grams,
    _flat_token_hashes,
    _segment_arange,
)

__all__ = ["bigram_logprob", "perplexity_buckets", "disc_quantile"]


def _bigram_context_counts(
    train: "ray.data.Dataset", *, text_col: str, batch_size: int
) -> "ray.data.Dataset":
    """Training bigram counts WITH their context key:
    ``(b_key, ctx_key, cnt)`` — one row per distinct bigram. The per-batch
    combiner collapses positions before the shuffle; ``ctx_key`` is
    functionally determined by ``b_key`` so the groupby carries it with Max."""
    from ray.data.aggregate import Max, Sum

    def _partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        th, offs = _flat_token_hashes(t[text_col])
        lens = np.diff(offs)
        blens = np.maximum(lens - 1, 0)
        if blens.sum() == 0:
            return pa.table({"b_key": pa.array([], pa.int64()),
                             "ctx_key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        starts = np.repeat(offs[:-1], blens) + _segment_arange(blens)
        b = th[starts] * _MIX + th[starts + 1]
        keys, first, cnt = np.unique(b, return_index=True, return_counts=True)
        return pa.table({
            "b_key": pa.array(keys.view(np.int64), pa.int64()),
            "ctx_key": pa.array(th[starts[first]].view(np.int64), pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    partial = train.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    return partial.groupby("b_key").aggregate(
        Sum("cnt", alias_name="cnt"), Max("ctx_key", alias_name="ctx_key")
    )


def bigram_logprob(
    docs: "ray.data.Dataset",
    train: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: tuple[str, ...] = (),
    backoff: float = 0.4,
    smoothing: float = 1.0,
    num_buckets: int | None = None,
    batch_size: int = 65536,
    id_type: pa.DataType | None = None,
    carry_types: dict[str, pa.DataType] | None = None,
) -> "ray.data.Dataset":
    """Score every doc in ``docs`` under a bigram stupid-backoff LM trained
    on ``train``; returns ``(id_col, *carry, n_tokens, logprob, ppl)``.

    Scale shape (the model meets the corpus in joins, exactly like
    :func:`odibel_ray.selection.dsir_logweights`):

    1. unigram model ``U(gram_key, cnt)`` — one combiner-first groupby over
       the training split (:func:`odibel_ray.selection.gram_counts`), then
       materialized: it is model-sized (one row per distinct token) and
       reused as the build input of two joins; ``T``/``V`` are two scalar
       aggregates over it;
    2. bigram model ``M(b_key, lp = ln c(bi) − ln c(ctx))`` — bigram counts
       join the unigram table on ``ctx_key`` (model-sized exchange);
    3. docs emit per-(doc, bigram) position counts (combiner collapses
       repeats) plus one first-token row per doc carrying ``n_tokens`` and
       the ``carry`` columns;
    4. bigram rows flow through TWO sequential bucketed joins — against
       ``M`` on ``b_key``, then against ``U`` on ``w_key`` (the backoff
       unigram) — so hit/miss never forks the dataset (no mid-pipeline
       materialization, no double execution);
    5. one final ``groupby(id)`` sums contributions.
    """
    from ray.data.aggregate import Max, Sum

    from odibel_ray.ops.relational import bucketed_join
    from odibel_ray.selection import gram_counts

    carry = tuple(carry)
    if id_type is None:
        id_type = pa.int64()
    carry_types = carry_types or {}
    ctypes = {c: carry_types.get(c, pa.string()) for c in carry}
    a = float(smoothing)

    # -- model ---------------------------------------------------------
    uni = gram_counts(train, n=1, text_col=text_col, batch_size=batch_size)
    uni = uni.map_batches(
        lambda t: t.rename_columns(["w_key", "cu"]), batch_format="pyarrow"
    ).materialize()  # model-sized; reused as join build side 2x
    totals = uni.aggregate(Sum("cu")) or {}
    t_tot = float(totals.get("sum(cu)") or 0)
    v_size = float(uni.count())
    ln_denom = float(np.log(t_tot + a * v_size)) if v_size else 0.0
    ln_bo = float(np.log(backoff))

    bi = _bigram_context_counts(train, text_col=text_col, batch_size=batch_size)
    model = bucketed_join(
        bi,
        uni.map_batches(lambda t: t.rename_columns(["ctx_key", "cu"]),
                        batch_format="pyarrow"),
        on="ctx_key", how="left", num_buckets=num_buckets,
        left_schema=pa.schema([("b_key", pa.int64()), ("cnt", pa.int64()),
                               ("ctx_key", pa.int64())]),
        right_schema=pa.schema([("ctx_key", pa.int64()), ("cu", pa.int64())]),
    ).map_batches(
        # ctx is in the unigram table by construction; coalesce is pure
        # defence against a degenerate empty-training run
        lambda t: pa.table({
            "b_key": t["b_key"],
            "lp": pc.subtract(
                pc.ln(pc.cast(t["cnt"], pa.float64())),
                pc.ln(pc.cast(pc.coalesce(t["cu"], pa.scalar(1, pa.int64())),
                              pa.float64())),
            ),
        }),
        batch_format="pyarrow", batch_size=batch_size,
    )

    # -- per-doc gram rows ----------------------------------------------
    def _first_rows(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        th, offs = _flat_token_hashes(t[text_col])
        lens = np.diff(offs)
        cols = {
            id_col: t[id_col],
            "w_key": pa.array(th[offs[:-1]].view(np.int64), pa.int64()),
            "n_tokens": pa.array(lens.astype(np.int64), pa.int64()),
        }
        for c in carry:
            cols[c] = t[c]
        return pa.table(cols)

    def _bigram_rows(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        th, offs = _flat_token_hashes(t[text_col])
        lens = np.diff(offs)
        blens = np.maximum(lens - 1, 0)
        if blens.sum() == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "b_key": pa.array([], pa.int64()),
                             "w_key": pa.array([], pa.int64()),
                             "n_pos": pa.array([], pa.int64())})
        starts = np.repeat(offs[:-1], blens) + _segment_arange(blens)
        b = th[starts] * _MIX + th[starts + 1]
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), blens)
        flat_firsts, counts = _collapse_doc_grams(doc_idx, b)
        pos = starts[flat_firsts]
        return pa.table({
            id_col: t[id_col].take(pa.array(doc_idx[flat_firsts])),
            "b_key": pa.array(b[flat_firsts].view(np.int64), pa.int64()),
            "w_key": pa.array(th[pos + 1].view(np.int64), pa.int64()),
            "n_pos": pa.array(counts, pa.int64()),
        })

    firsts = docs.map_batches(_first_rows, batch_format="pyarrow",
                              batch_size=batch_size)
    bigrams = docs.map_batches(_bigram_rows, batch_format="pyarrow",
                               batch_size=batch_size)

    # -- scoring joins ---------------------------------------------------
    def _uni_contrib(cu, n_pos, extra: float):
        cu_f = pc.cast(pc.coalesce(cu, pa.scalar(0, pa.int64())), pa.float64())
        lp = pc.add(pc.subtract(pc.ln(pc.add(cu_f, pa.scalar(a))),
                                pa.scalar(ln_denom)), pa.scalar(extra))
        return pc.multiply(pc.cast(n_pos, pa.float64()), lp)

    first_schema = pa.schema([(id_col, id_type), ("w_key", pa.int64()),
                              ("n_tokens", pa.int64()),
                              *[(c, ctypes[c]) for c in carry]])
    j_first = bucketed_join(
        firsts, uni, on="w_key", how="left", num_buckets=num_buckets,
        left_schema=first_schema,
        right_schema=pa.schema([("w_key", pa.int64()), ("cu", pa.int64())]),
    )

    def _first_contrib(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        cols = {
            id_col: t[id_col],
            "n_pos": pa.array(np.ones(len(t), np.int64), pa.int64()),
            "contrib": _uni_contrib(t["cu"], pa.array(np.ones(len(t), np.int64)), 0.0),
            "n_tokens": t["n_tokens"],
        }
        for c in carry:
            cols[c] = t[c]
        return pa.table(cols)

    scored_first = j_first.map_batches(_first_contrib, batch_format="pyarrow",
                                       batch_size=batch_size)

    j1 = bucketed_join(
        bigrams, model, on="b_key", how="left", num_buckets=num_buckets,
        left_schema=pa.schema([(id_col, id_type), ("b_key", pa.int64()),
                               ("w_key", pa.int64()), ("n_pos", pa.int64())]),
        right_schema=pa.schema([("b_key", pa.int64()), ("lp", pa.float64())]),
    )
    j2 = bucketed_join(
        j1, uni, on="w_key", how="left", num_buckets=num_buckets,
        left_schema=pa.schema([(id_col, id_type), ("b_key", pa.int64()),
                               ("w_key", pa.int64()), ("n_pos", pa.int64()),
                               ("lp", pa.float64())]),
        right_schema=pa.schema([("w_key", pa.int64()), ("cu", pa.int64())]),
    )

    def _bigram_contrib(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        hit = pc.multiply(pc.cast(t["n_pos"], pa.float64()),
                          pc.coalesce(t["lp"], pa.scalar(0.0)))
        miss = _uni_contrib(t["cu"], t["n_pos"], ln_bo)
        contrib = pc.if_else(pc.is_valid(t["lp"]), hit, miss)
        cols = {
            id_col: t[id_col],
            "n_pos": t["n_pos"],
            "contrib": contrib,
            "n_tokens": pa.nulls(len(t), pa.int64()),
        }
        for c in carry:
            cols[c] = pa.nulls(len(t), ctypes[c])
        return pa.table(cols)

    scored_bi = j2.map_batches(_bigram_contrib, batch_format="pyarrow",
                               batch_size=batch_size)

    aggs = [Sum("contrib", alias_name="logprob"),
            Max("n_tokens", alias_name="n_tokens")]
    aggs += [Max(c, alias_name=c) for c in carry]
    per_doc = scored_first.union(scored_bi).groupby(id_col).aggregate(*aggs)

    def _finish(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        lp = t["logprob"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        ppl = np.exp(-lp / np.maximum(n, 1.0))
        cols = {id_col: t[id_col]}
        for c in carry:
            cols[c] = t[c]
        cols["n_tokens"] = t["n_tokens"]
        cols["logprob"] = t["logprob"]
        cols["ppl"] = pa.array(ppl, pa.float64())
        return pa.table(cols)

    return per_doc.map_batches(_finish, batch_format="pyarrow",
                               batch_size=batch_size)


def disc_quantile(sorted_vals: np.ndarray, q: float) -> float:
    """SQL ``PERCENTILE_DISC`` / DuckDB ``quantile_disc``: the element at
    1-based rank ``ceil(q*n)`` of the ascending-sorted values."""
    n = len(sorted_vals)
    return float(sorted_vals[max(int(np.ceil(q * n)), 1) - 1])


def perplexity_buckets(
    scored: "ray.data.Dataset",
    *,
    by: str = "lang",
    value_col: str = "ppl",
    qs: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """CCNet head/middle/tail binning: per-``by`` (language) perplexity
    tercile cutoffs, then per-(group, bucket) doc and token counts —
    ``(by, bucket, n_docs, n_tokens)``. Lower perplexity = closer to the
    reference corpus = ``head``.

    The cutoff pass sorts only the 2-column ``(by, value)`` projection per
    group (exact ``PERCENTILE_DISC``, matching the SQL oracle); the cutoff
    table is one row per language — genuinely bounded — so it broadcasts
    into the assignment pass instead of a corpus shuffle.
    """
    from ray.data.aggregate import Count, Sum

    from odibel_ray.ops.relational import _small_table

    # the cuts pass and the assignment pass both consume `scored`; pin ONE
    # execution (the LM-scoring pipeline is the dominant cost, and float
    # summation order could otherwise flip a doc sitting exactly on a
    # cutoff between the two passes — the same boundary hazard the SQL
    # oracle pins with AS MATERIALIZED)
    scored = scored.materialize()

    def _cuts(g: pa.Table) -> pa.Table:
        vals = np.sort(g[value_col].to_numpy(zero_copy_only=False))
        return pa.table({
            by: g[by].slice(0, 1),
            "c1": pa.array([disc_quantile(vals, qs[0])], pa.float64()),
            "c2": pa.array([disc_quantile(vals, qs[1])], pa.float64()),
        })

    cuts_t = _small_table(
        scored.select_columns([by, value_col]).groupby(by).map_groups(
            _cuts, batch_format="pyarrow"
        )
    )
    c1 = dict(zip(cuts_t[by].to_pylist(), cuts_t["c1"].to_pylist()))
    c2 = dict(zip(cuts_t[by].to_pylist(), cuts_t["c2"].to_pylist()))

    def _assign(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        keys = t[by].to_pylist()  # bounded distinct values; rows vectorized below
        v = t[value_col].to_numpy(zero_copy_only=False)
        lo = np.array([c1[k] for k in keys])
        hi = np.array([c2[k] for k in keys])
        bucket = np.where(v <= lo, labels[0], np.where(v <= hi, labels[1], labels[2]))
        return pa.table({
            by: t[by],
            "bucket": pa.array(bucket, pa.string()),
            "n_tokens": t["n_tokens"],
        })

    return (
        scored.map_batches(_assign, batch_format="pyarrow", batch_size=batch_size)
        .groupby([by, "bucket"])
        .aggregate(Count(alias_name="n_docs"), Sum("n_tokens", alias_name="n_tokens"))
    )
