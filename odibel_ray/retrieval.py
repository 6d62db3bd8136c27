"""Keyword retrieval scoring — corpus-statistics BM25 (Robertson & Zaragoza
2009, *The Probabilistic Relevance Framework: BM25 and Beyond*; idf form as in
Lucene's ``BM25Similarity``).

The training-data use case is query-driven corpus slicing: "rank every
document against this topic probe" (domain selection, eval-set mining,
contamination triage) — the lexical complement of the embedding ANN path in
:mod:`odibel_ray.sim`.

Scale shape — the query is bounded (a handful of terms), so NOTHING here
shuffles the corpus:

1. one streaming ``map_batches`` pass emits a fixed-width partial row per
   batch (doc count, token count, one df column per query term — document
   frequencies, not positions); a scalar ``aggregate`` sums them. This is
   the same shuffle-free mergeable-partial pattern as
   :func:`odibel_ray.ops.sketches.approx_count_distinct`;
2. the driver derives the (|q|-row) idf table from those scalars and closes
   it over a second streaming pass that emits ``(doc, n_tokens, score)`` for
   matching docs. Term membership per batch is one vectorized equality +
   cumsum-segment reduction per query term.

Token identity matches every other gram-keyed op
(:func:`odibel_ray.dedup._flat_token_hashes`: split on a single space,
hash per token), so the SQL oracle's ``string_split`` replays it exactly.

Reference parity: the reference has no retrieval stage — this extends its
profile-evaluator family (``evaluation/MetadataEvaluator.scala``) with the
standard lexical relevance signal.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

from odibel_ray.dedup import _flat_token_hashes

__all__ = ["bm25_scores", "bm25_topk"]


def _query_term_hashes(query: str) -> tuple[np.ndarray, list[str]]:
    """Distinct query-term hashes (first-occurrence order) + the terms."""
    terms: list[str] = []
    seen = set()
    for tok in query.split(" "):
        if tok not in seen:
            seen.add(tok)
            terms.append(tok)
    th = pd.util.hash_array(np.asarray(terms, dtype=object), categorize=False)
    return th.astype(np.uint64), terms


def _per_doc_term_counts(
    texts, qh: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(tf matrix [n_docs × n_terms], doc lengths) for one batch, vectorized:
    one equality mask + one cumsum-segment reduction per query term (|q| is
    bounded; each pass is O(batch tokens))."""
    th, offs = _flat_token_hashes(texts)
    lens = np.diff(offs)
    tf = np.empty((len(lens), len(qh)), dtype=np.int64)
    for j, h in enumerate(qh):
        c = np.concatenate(([0], np.cumsum(th == h, dtype=np.int64)))
        tf[:, j] = c[offs[1:]] - c[offs[:-1]]
    return tf, lens


def bm25_scores(
    docs: "ray.data.Dataset",
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: tuple[str, ...] = (),
    k1: float = 1.2,
    b: float = 0.75,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Score every document containing ≥1 query term under BM25; returns
    ``(id_col, *carry, n_tokens, score)``.

    ``idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))`` (Lucene's
    nonnegative form), ``score(d) = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl))`` over DISTINCT query terms.
    """
    from ray.data.aggregate import Sum

    qh, terms = _query_term_hashes(query)
    m = len(qh)

    def _stats_partial(t: pa.Table) -> pa.Table:
        tf, lens = _per_doc_term_counts(t[text_col], qh)
        cols: dict[str, pa.Array] = {
            "n_docs": pa.array([len(lens)], pa.int64()),
            "sum_dl": pa.array([int(lens.sum())], pa.int64()),
        }
        for j in range(m):
            cols[f"df_{j}"] = pa.array([int((tf[:, j] > 0).sum())], pa.int64())
        return pa.table(cols)

    stats_cols = ["n_docs", "sum_dl"] + [f"df_{j}" for j in range(m)]
    agg = (
        docs.select_columns([text_col])
        .map_batches(_stats_partial, batch_format="pyarrow", batch_size=batch_size)
        .aggregate(*[Sum(c, alias_name=c) for c in stats_cols])
    ) or {}
    n_docs = float(agg.get("n_docs") or 0)
    if n_docs == 0:
        raise ValueError("bm25_scores: empty corpus")
    avgdl = float(agg.get("sum_dl") or 0) / n_docs
    df = np.array([float(agg.get(f"df_{j}") or 0) for j in range(m)])
    idf = np.log1p((n_docs - df + 0.5) / (df + 0.5))

    def _score(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        tf, lens = _per_doc_term_counts(t[text_col], qh)
        norm = k1 * (1.0 - b + b * lens.astype(np.float64) / avgdl)
        # Σ_t idf·tf·(k1+1)/(tf + norm) — summed in fixed term order
        score = np.zeros(len(lens), dtype=np.float64)
        for j in range(m):
            tfj = tf[:, j].astype(np.float64)
            score += idf[j] * tfj * (k1 + 1.0) / (tfj + norm)
        hit = tf.sum(axis=1) > 0
        keep = np.flatnonzero(hit)
        out = {id_col: t[id_col].take(pa.array(keep, pa.int64()))}
        for c in carry:
            out[c] = t[c].take(pa.array(keep, pa.int64()))
        out["n_tokens"] = pa.array(lens[keep], pa.int64())
        out["score"] = pa.array(score[keep], pa.float64())
        return pa.table(out)

    return docs.select_columns([id_col, *carry, text_col]).map_batches(
        _score, batch_format="pyarrow", batch_size=batch_size
    )


def bm25_topk(
    docs: "ray.data.Dataset",
    query: str,
    k: int,
    *,
    id_col: str = "doc_id",
    **kwargs,
) -> "ray.data.Dataset":
    """Top-``k`` documents by BM25 score (ties broken by ascending id for
    determinism): each batch keeps its local top-k under the SAME
    (score desc, id asc) order before the global sort+limit, so the sort
    sees ≤ k rows per batch — the combiner-first top-k shape of
    :func:`odibel_ray.ops.relational.topk`, multi-key."""
    import pyarrow.compute as pc

    keys = [("score", "descending"), (id_col, "ascending")]
    scored = bm25_scores(docs, query, id_col=id_col, **kwargs)

    def _local(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if len(t) <= k:
            return t
        return t.take(pc.select_k_unstable(t, k, sort_keys=keys))

    pruned = scored.map_batches(_local, batch_format="pyarrow")
    return pruned.sort([k_ for k_, _ in keys], descending=[d == "descending" for _, d in keys]).limit(k)
