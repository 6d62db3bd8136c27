"""Composed corpus-curation pipeline: the standard pre-training sweep
(exact dedup → length gate → cross-document duplication gate) as ONE lazy
Ray Data pipeline — each stage feeds the next without materializing, so the
whole sweep streams and the only exchanges are the dedup shuffle and the
gram-join already inside :func:`odibel_ray.dedup.cross_doc_ngram_dup`.

This is the composition story for the training-data suite: every stage is an
independently-oracled operator (`doc_prefix_dedup`-family exact dedup,
`doc_token_stats` token gating, `doc_ngram_dup` duplication profile), and the
composed pipeline is itself SQL-oracled end-to-end (q:corpus_curation).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = ("source",),
    min_tokens: int = 8,
    ngram: int = 3,
    max_dup_frac: float = 0.5,
    min_docs: int = 2,
    num_buckets: int | None = None,
    batch_size: int = 65536,
    carry_types: dict | None = None,
) -> "ray.data.Dataset":
    """Kept-document profile after the three standard curation gates.

    1. EXACT DEDUP on the full text — one representative (min ``id_col``)
       per distinct document body (combiner + one hash shuffle);
    2. LENGTH GATE — drop docs with fewer than ``min_tokens`` whitespace
       tokens (pure per-batch filter, no exchange);
    3. DUPLICATION GATE — per-doc cross-corpus ``ngram``-gram duplication
       profile over the SURVIVORS of gates 1–2 (so a document's dup fraction
       is measured against the already-deduped corpus, the order real
       pipelines use), dropping docs whose duplicated-position fraction
       exceeds ``max_dup_frac``.

    Returns one row per kept doc: ``(id_col, *carry, n_tokens, n_grams,
    n_dup)``. The result is a pure function of the input corpus — no stage
    samples or depends on partitioning. ``carry_types`` maps non-string
    ``carry`` columns to their Arrow types (forwarded to the gram join's
    schema, like :func:`odibel_ray.dedup.cross_doc_ngram_dup`).

    Requires ``min_tokens >= ngram``: a doc with fewer than ``ngram`` tokens
    emits zero grams, so the duplication profile has no row for it and it
    would silently vanish from the kept set despite passing every gate."""
    from odibel_ray.dedup import cross_doc_ngram_dup
    from odibel_ray.ops.relational import exact_dedup

    if min_tokens < ngram:
        raise ValueError(
            f"min_tokens={min_tokens} < ngram={ngram}: docs shorter than one "
            "gram would pass the gates but emit no profile row"
        )
    deduped = exact_dedup(
        docs, [text_col], tie_break=id_col, batch_size=batch_size
    )

    def _gate_len(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern(pc.coalesce(t[text_col], pa.scalar("")), pattern=" ")
        n_tok = pc.list_value_length(toks)
        t = t.append_column("n_tokens", pc.cast(n_tok, pa.int64()))
        return t.filter(pc.greater_equal(t["n_tokens"], min_tokens))

    gated = deduped.map_batches(_gate_len, batch_format="pyarrow",
                                batch_size=batch_size)

    profile = cross_doc_ngram_dup(
        gated, n=ngram, text_col=text_col, id_col=id_col,
        carry=carry + ("n_tokens",), min_docs=min_docs,
        num_buckets=num_buckets, batch_size=batch_size,
        carry_types={**(carry_types or {}), "n_tokens": pa.int64()},
    )

    def _gate_dup(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        nd = t["n_dup"].to_numpy(zero_copy_only=False).astype(np.float64)
        ng = t["n_grams"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = nd <= max_dup_frac * ng
        t = t.filter(pa.array(keep))
        return t.select([id_col, *carry, "n_tokens", "n_grams", "n_dup"])

    return profile.map_batches(_gate_dup, batch_format="pyarrow",
                               batch_size=batch_size)
