"""BPE training/encoding vs an independent naive reference implementation.

The reference here follows the original Sennrich et al. pseudo-code shape:
a vocab dict of space-joined symbol strings, regex-free pair counting, and
string substitution per merge — deliberately a different representation
from the library's list-of-symbols kernels, so agreement is evidence of
matching *semantics*, not shared code.
"""

import collections

import pyarrow as pa
import pytest

from odibel_ray.bpe import (
    END_OF_WORD,
    BpeEncoder,
    decode_tokens,
    encode_bpe,
    merges_from_table,
    merges_table,
    train_bpe,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the newest and the widest and the lowest",
    "low lower lowest newest new news",
    "a b ab ba abba",
    "numbers 123 123 1234 and symbols !! !?",
]


def _naive_bpe(corpus, num_merges, min_count):
    vocab = collections.Counter()
    for line in corpus:
        for w in line.split():
            vocab[" ".join(list(w) + [END_OF_WORD])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for word, freq in vocab.items():
            syms = word.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        top = max(pairs.values())
        if top < min_count:
            break
        best = min(p for p, c in pairs.items() if c == top)
        new_vocab = collections.Counter()
        for word, freq in vocab.items():
            # split/scan replacement to avoid substring false positives
            syms = word.split(" ")
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[" ".join(out)] += freq
        vocab = new_vocab
        merges.append(best)
    return merges


def _corpus_ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(CORPUS)), pa.int64()),
                "text": pa.array(CORPUS, pa.string()),
            }
        )
    )


@pytest.mark.parametrize("min_count", [1, 2])
def test_train_driver_path_matches_naive(ray_session, min_count):
    expected = _naive_bpe(CORPUS, 40, min_count)
    got = train_bpe(_corpus_ds(), num_merges=40, min_count=min_count)
    assert got == expected
    assert len(got) > 5  # the corpus genuinely produces merges


def test_train_distributed_path_matches_naive(ray_session):
    expected = _naive_bpe(CORPUS, 12, 2)
    # driver_budget_rows=0 forces the distributed per-merge plan
    got = train_bpe(_corpus_ds(), num_merges=12, min_count=2, driver_budget_rows=0)
    assert got == expected


def test_encoder_matches_training_segmentation(ray_session):
    """Encoding a training word must reproduce exactly the symbols the merge
    loop left for it (apply merges in rank order = the training process)."""
    merges = train_bpe(_corpus_ds(), num_merges=30, min_count=1)
    enc = BpeEncoder(merges)
    for line in CORPUS:
        for w in line.split():
            syms = list(w) + [END_OF_WORD]
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            assert enc._encode_word(w) == syms, w


def test_encode_dataset_and_roundtrip(ray_session):
    merges = train_bpe(_corpus_ds(), num_merges=30, min_count=1)
    out = encode_bpe(_corpus_ds(), merges, concurrency=2).take_all()
    assert len(out) == len(CORPUS)
    by_id = {r["doc_id"]: r for r in out}
    for i, line in enumerate(CORPUS):
        r = by_id[i]
        assert r["bpe_tokens_n"] == len(r["bpe_tokens"])
        # every token boundary decodes back to the normalized original text
        assert decode_tokens(r["bpe_tokens"]) == " ".join(line.split())
        # BPE never crosses word boundaries: token count per word >= 1
        assert r["bpe_tokens_n"] >= len(line.split())


def test_merges_table_roundtrip():
    merges = [("l", "o"), ("lo", "w"), ("e", "s")]
    t = merges_table(merges)
    assert t.column_names == ["rank", "a", "b"]
    assert merges_from_table(t) == merges


def test_train_distributed_batched_long_sequence(ray_session):
    """40 merges at min_count=1 through the batched distributed plan — the
    full merge sequence (including end-of-vocabulary degenerate merges)
    must equal the naive serial reference."""
    expected = _naive_bpe(CORPUS, 40, 1)
    got = train_bpe(
        _corpus_ds(), num_merges=40, min_count=1, driver_budget_rows=0
    )
    assert got == expected


def test_train_distributed_speculation_rollback(ray_session):
    """Adversarial corpus where a newly fused pair outranks the rest of the
    speculative batch: 'abc'×8 makes (ab,c) count 8 right after (a,b) is
    merged, beating (d,e) count 3 — the exact-delta validation must
    truncate the batch so the sequence still equals serial. 'aaaa' words
    additionally pin the vectorized greedy non-overlap run handling."""
    import ray.data as rd

    corpus = ["abc abc abc abc", "abc abc abc abc", "de de de", "aaaa aaaa aaaa"]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(corpus)), pa.int64()),
                "text": pa.array(corpus),
            }
        )
    )
    expected = _naive_bpe(corpus, 12, 1)
    got = train_bpe(ds, num_merges=12, min_count=1, driver_budget_rows=0)
    assert got == expected


@pytest.mark.parametrize("batch_merges", [1, 3, 64])
def test_train_distributed_batch_size_invariant(ray_session, batch_merges):
    """The merge sequence must not depend on the speculation batch size."""
    expected = _naive_bpe(CORPUS, 20, 2)
    got = train_bpe(
        _corpus_ds(),
        num_merges=20,
        min_count=2,
        driver_budget_rows=0,
        batch_merges=batch_merges,
    )
    assert got == expected


@pytest.mark.parametrize("sample_rows", [1, 4, 100])
def test_train_distributed_partial_sample_still_exact(ray_session, sample_rows):
    """With a speculation sample much smaller than the histogram, the
    prediction is wrong often — full-corpus exact-delta validation must
    still pin the serial sequence exactly (just in more rounds)."""
    expected = _naive_bpe(CORPUS, 25, 1)
    got = train_bpe(
        _corpus_ds(),
        num_merges=25,
        min_count=1,
        driver_budget_rows=0,
        sample_rows=sample_rows,
    )
    assert got == expected
