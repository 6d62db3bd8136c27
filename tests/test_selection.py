import math

import numpy as np
import pyarrow as pa
import pytest


def test_gram_counts_exact(ray_session):
    import ray.data as rd

    from odibel_ray.selection import gram_counts

    docs = pa.table({"doc_id": [1, 2], "text": ["a b a b", "a b c"]})
    out = gram_counts(rd.from_arrow(docs), n=2).take_all()
    # bigrams: doc1 = [a b, b a, a b], doc2 = [a b, b c]
    cnts = sorted(r["cnt"] for r in out)
    assert cnts == [1, 1, 3]  # "b a":1, "b c":1, "a b":3
    assert sum(cnts) == 5


def test_dsir_logweights_matches_brute_force(ray_session):
    import ray.data as rd

    from odibel_ray.selection import dsir_logweights

    target_texts = ["cat sat mat", "cat sat hat"]
    raw_texts = ["cat sat mat now", "dog ran far away", "x"]  # "x": no bigram
    target = rd.from_arrow(pa.table({"doc_id": [100, 101], "text": target_texts}))
    raw = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "text": raw_texts}))

    out = {r["doc_id"]: r for r in dsir_logweights(raw, target, n=2).take_all()}
    assert set(out) == {1, 2}  # doc 3 has < 2 tokens

    def grams(s):
        t = s.split(" ")
        return [" ".join(t[i:i + 2]) for i in range(len(t) - 1)]

    from collections import Counter
    ct = Counter(g for s in target_texts for g in grams(s))
    cr = Counter(g for s in raw_texts for g in grams(s))
    vocab = set(ct) | set(cr)
    tt, tr, v = sum(ct.values()), sum(cr.values()), len(vocab)

    def lw(g):
        return (math.log(ct[g] + 1.0) - math.log(tt + v)) - (
            math.log(cr[g] + 1.0) - math.log(tr + v))

    for i, s in [(1, raw_texts[0]), (2, raw_texts[1])]:
        gs = grams(s)
        assert out[i]["n_grams"] == len(gs)
        assert out[i]["log_w"] == pytest.approx(sum(lw(g) for g in gs), abs=1e-12)
    # target-like doc scores higher than off-domain doc
    assert out[1]["log_w"] > out[2]["log_w"]


def test_bucketed_join_full_outer(ray_session):
    import ray.data as rd

    from odibel_ray.ops.relational import bucketed_join

    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "a": [10, 20, 30]}))
    right = rd.from_arrow(pa.table({"k": [2, 3, 4], "b": [200, 300, 400]}))
    out = bucketed_join(
        left, right, on="k", how="outer", num_buckets=4,
        left_schema=pa.schema([("k", pa.int64()), ("a", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("b", pa.int64())]),
    ).take_all()
    rows = {r["k"]: (r["a"], r["b"]) for r in out}
    assert rows == {1: (10, None), 2: (20, 200), 3: (30, 300), 4: (None, 400)}


def test_curate_corpus_gates(ray_session):
    import ray.data as rd

    from odibel_ray.pipelines.corpus import curate_corpus

    uniq = "u1 u2 u3 u4 u5 u6 u7 u8 u9"          # 9 tokens, all grams unique
    docs = pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "source": ["a", "a", "b", "b", "b", "c", "c"],
        "text": [
            uniq,                                  # kept, zero dup (its exact
            uniq,                                  # dup is removed FIRST)
            "too short",                           # < 8 tokens → dropped
            # 4 & 5 share the s1..s5 run: 3 of 7 grams → 3/7 ≤ 0.5 → kept
            "s1 s2 s3 s4 s5 a1 a2 a3 a4",
            "s1 s2 s3 s4 s5 b1 b2 b3 b4",
            # 6 & 7 share t1..t8: 6 of 7 grams each → 6/7 > 0.5 → dropped
            "t1 t2 t3 t4 t5 t6 t7 t8 x1",
            "t1 t2 t3 t4 t5 t6 t7 t8 y1",
        ],
    })
    out = {r["doc_id"]: r for r in
           curate_corpus(rd.from_arrow(docs), min_tokens=8, ngram=3,
                         max_dup_frac=0.5).take_all()}
    # dup gate is symmetric: both members of the 6/7-overlap pair drop
    assert set(out) == {1, 4, 5}
    assert out[1]["n_tokens"] == 9 and out[1]["n_grams"] == 7
    assert out[1]["n_dup"] == 0            # exact dup removed before profiling
    assert out[4]["n_dup"] == 3 and out[5]["n_dup"] == 3
    assert out[4]["source"] == "b" and out[1]["source"] == "a"
