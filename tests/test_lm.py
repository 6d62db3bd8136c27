"""Bigram stupid-backoff LM scoring (odibel_ray.lm) vs a pure-Python
reference implementation, plus the CCNet bucket pass."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest


def _ref_score(doc: str, train_texts: list[str], *, bo=0.4, a=1.0):
    """Single-process stupid-backoff reference (same rule as the module doc)."""
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for t in train_texts:
        toks = t.split(" ")
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(toks, toks[1:]):
            bi[(x, y)] = bi.get((x, y), 0) + 1
    T, V = sum(uni.values()), len(uni)

    def p_uni(w):
        return math.log(uni.get(w, 0) + a) - math.log(T + a * V)

    toks = doc.split(" ")
    lp = p_uni(toks[0])
    for x, y in zip(toks, toks[1:]):
        if (x, y) in bi:
            lp += math.log(bi[(x, y)]) - math.log(uni[x])
        else:
            lp += math.log(bo) + p_uni(y)
    return lp, len(toks)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 15)))
        for _ in range(80)
    ]
    return pa.table({
        "doc_id": pa.array(range(80), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en" if i % 2 else "de" for i in range(80)], pa.string()),
    })


def test_bigram_logprob_matches_reference(ray_session, corpus):
    import ray.data as rd

    from odibel_ray.lm import bigram_logprob

    train_texts = [t for i, t in enumerate(corpus["text"].to_pylist()) if i % 7 == 0]
    docs = rd.from_arrow(corpus)
    train = docs.filter(lambda r: r["doc_id"] % 7 == 0)
    out = {r["doc_id"]: r for r in
           bigram_logprob(docs, train, carry=("lang",)).take_all()}
    assert set(out) == set(range(80))
    for i, text in enumerate(corpus["text"].to_pylist()):
        lp, n = _ref_score(text, train_texts)
        assert out[i]["n_tokens"] == n
        assert out[i]["logprob"] == pytest.approx(lp, abs=1e-9)
        assert out[i]["ppl"] == pytest.approx(math.exp(-lp / n), rel=1e-9)
        assert out[i]["lang"] == corpus["lang"][i].as_py()


def test_train_docs_score_best(ray_session, corpus):
    """Docs the model was trained on must land low-perplexity on average."""
    import ray.data as rd

    from odibel_ray.lm import bigram_logprob

    docs = rd.from_arrow(corpus)
    train = docs.filter(lambda r: r["doc_id"] % 7 == 0)
    rows = bigram_logprob(docs, train).take_all()
    seen = [r["ppl"] for r in rows if r["doc_id"] % 7 == 0]
    unseen = [r["ppl"] for r in rows if r["doc_id"] % 7 != 0]
    assert np.mean(seen) < np.mean(unseen)


def test_perplexity_buckets(ray_session, corpus):
    import ray.data as rd

    from odibel_ray.lm import bigram_logprob, disc_quantile, perplexity_buckets

    docs = rd.from_arrow(corpus)
    train = docs.filter(lambda r: r["doc_id"] % 7 == 0)
    scored = bigram_logprob(docs, train, carry=("lang",))
    rows = scored.take_all()
    got = {(r["lang"], r["bucket"]): r for r in
           perplexity_buckets(scored, by="lang").take_all()}

    # reference binning per language
    for lang in ("en", "de"):
        ppls = np.sort([r["ppl"] for r in rows if r["lang"] == lang])
        c1, c2 = disc_quantile(ppls, 1 / 3), disc_quantile(ppls, 2 / 3)
        want = {"head": 0, "middle": 0, "tail": 0}
        tok = {"head": 0, "middle": 0, "tail": 0}
        for r in rows:
            if r["lang"] != lang:
                continue
            b = "head" if r["ppl"] <= c1 else ("middle" if r["ppl"] <= c2 else "tail")
            want[b] += 1
            tok[b] += r["n_tokens"]
        for b, n in want.items():
            if n == 0:
                assert (lang, b) not in got
            else:
                assert got[(lang, b)]["n_docs"] == n
                assert got[(lang, b)]["n_tokens"] == tok[b]


def test_disc_quantile_matches_duckdb():
    import duckdb

    from odibel_ray.lm import disc_quantile

    rng = np.random.default_rng(3)
    for n in (1, 2, 3, 5, 8, 40):
        vals = np.sort(rng.random(n))
        for q in (1 / 3, 0.5, 2 / 3, 0.9):
            want = duckdb.sql(
                f"SELECT quantile_disc(x, {q}) FROM (SELECT unnest(?::DOUBLE[]) x)",
                params=[list(vals)],
            ).fetchone()[0]
            assert disc_quantile(vals, q) == pytest.approx(want, rel=0, abs=0)
