"""BM25 retrieval scoring (odibel_ray/retrieval.py) vs an in-process
single-pass reference implementation."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from odibel_ray.retrieval import bm25_scores, bm25_topk

DOCS = [
    "hash join merge sort scan",
    "the quick brown fox",
    "join join join hash",
    "sort sort sort sort sort merge",
    "table scan filter",
    "",
    "hash",
]


def _ref_bm25(docs, query, k1=1.2, b=0.75):
    """Plain-Python reference: same formula, same tokenizer (split on ' ')."""
    toks = [d.split(" ") for d in docs]
    terms = list(dict.fromkeys(query.split(" ")))
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    df = {t: sum(1 for d in toks if t in d) for t in terms}
    out = {}
    for i, d in enumerate(toks):
        score, hit = 0.0, False
        for t in terms:
            tf = d.count(t)
            if tf:
                hit = True
            idf = math.log1p((n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if hit:
            out[i] = (len(d), score)
    return out


def _ds():
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS,
                  "lang": ["en"] * len(DOCS)})
    )


def test_bm25_scores_match_reference(ray_session):
    got = bm25_scores(_ds(), "hash join merge sort").to_pandas()
    ref = _ref_bm25(DOCS, "hash join merge sort")
    assert set(got.doc_id) == set(ref)
    for _, r in got.iterrows():
        n_tok, score = ref[r.doc_id]
        assert r.n_tokens == n_tok
        assert abs(r.score - score) < 1e-12, (r.doc_id, r.score, score)


def test_bm25_repeated_query_terms_deduped(ray_session):
    a = bm25_scores(_ds(), "hash hash join").to_pandas().sort_values("doc_id")
    c = bm25_scores(_ds(), "hash join").to_pandas().sort_values("doc_id")
    np.testing.assert_allclose(a.score.to_numpy(), c.score.to_numpy())


def test_bm25_carry_columns(ray_session):
    got = bm25_scores(_ds(), "hash", carry=("lang",)).to_pandas()
    assert list(got.columns) == ["doc_id", "lang", "n_tokens", "score"]
    assert (got.lang == "en").all()


def test_bm25_topk_order_and_ties(ray_session):
    got = bm25_topk(_ds(), "hash join merge sort", 3).to_pandas()
    ref = _ref_bm25(DOCS, "hash join merge sort")
    want = sorted(ref.items(), key=lambda kv: (-kv[1][1], kv[0]))[:3]
    assert list(got.doc_id) == [i for i, _ in want]
    assert list(got.score) == sorted(got.score, reverse=True)


def test_bm25_empty_corpus_raises(ray_session):
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_scores(empty, "hash")
