"""Deduplication suite over the ``documents`` table: exact, MinHash+LSH,
SimHash, n-gram Jaccard verification, embedding-cosine near-dup.

Shapes (all Ray-Data-first, SURVEY.md "training-data pipeline" requirements):

- **exact**: hash-partition on the content hash → per-group first
  (:func:`odibel_ray.ops.relational.exact_dedup` over a fingerprint column).
- **MinHash + LSH**: per-batch vectorized shingle→minhash signatures →
  ``flat_map`` one row per LSH band → ``groupby(band_key)`` — candidate pairs
  only form inside a band bucket (the shuffle key), then exact n-gram Jaccard
  verifies candidates inside the group. No all-pairs comparison anywhere.
- **SimHash**: 64-bit hyperplane-free simhash over token hashes; near-dup =
  identical simhash bucket on k rotated views (Hamming-adjacent buckets).
- **embedding cosine**: batch matmul against an LSH-bucketed (random
  hyperplane) index; same band-groupby shape as MinHash.

At 100 TB: the only all-to-all is the band groupby whose payload is
``(band_key, doc_id, signature)`` — tens of bytes per row per band, not the
documents; texts needed for verification are re-joined per candidate group via
broadcast lookup at test scale and a keyed join at cluster scale.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_MERSENNE = np.uint64((1 << 61) - 1)


def _token_hashes(texts: list[str], n: int) -> list[np.ndarray]:
    """Per-doc array of n-gram (word shingle) hashes, vectorized per doc."""
    out = []
    for s in texts:
        toks = (s or "").split(" ")
        if len(toks) < n:
            out.append(np.array([], dtype=np.uint64))
            continue
        # hash each n-gram via pandas string hash of the joined shingle
        shingles = np.array(
            [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)], dtype=object
        )
        out.append(pd.util.hash_array(shingles, categorize=False))
    return out


class MinHasher:
    """Actor-pool stage: doc → (doc_id, minhash signature, band keys).

    The permutation coefficients (a, b) are generated once per actor in
    ``__init__`` from a fixed seed — identical across actors, so signatures are
    globally consistent. Emits ``n_bands`` rows per doc (``flat_map``-style
    fan-out inside ``map_batches``): ``band``, ``band_hash``, ``doc_id``,
    ``sig`` (the band's slice of the signature, for in-bucket verification).
    """

    def __init__(self, num_perm: int = 64, n_bands: int = 16, shingle: int = 3, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm, self.n_bands, self.shingle = num_perm, n_bands, shingle
        self.rows_per_band = num_perm // n_bands

    def signature(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (num_perm, n_hashes) universal hashing, min over shingles
        v = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        texts = t["text"].to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sigs = np.stack(
            [self.signature(h) for h in _token_hashes(texts, self.shingle)]
        )  # (n_docs, num_perm)
        n = len(ids)
        r = self.rows_per_band
        band_sigs = sigs.reshape(n, self.n_bands, r)
        band_hash = np.zeros((n, self.n_bands), dtype=np.uint64)
        for j in range(r):
            band_hash = band_hash * np.uint64(0x9E3779B97F4A7C15) + band_sigs[:, :, j]
        bands = np.tile(np.arange(self.n_bands, dtype=np.int64), n)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.n_bands)),
                "band": pa.array(bands),
                "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64)),
                "sig": pa.array(list(sigs.astype(np.int64)[np.repeat(np.arange(n), self.n_bands)])),
            }
        )


def _pairs_in_bucket(t: pa.Table, threshold: float, num_perm: int) -> pa.Table:
    """Candidate pairs inside one (band, band_hash) bucket; estimated Jaccard =
    fraction of matching minhash positions; keep pairs ≥ threshold."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    # bucket sizes are tiny (docs agreeing on a full band); all-pairs here is OK
    uniq, idx = np.unique(ids, return_index=True)
    if len(uniq) < 2:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())}
        )
    sigs = np.stack(t["sig"].to_numpy(zero_copy_only=False)[idx])
    n = len(uniq)
    ia, ib = np.triu_indices(n, k=1)
    match = (sigs[ia] == sigs[ib]).mean(axis=1)
    keep = match >= threshold
    order = np.argsort(uniq)
    a, b = uniq[ia[keep]], uniq[ib[keep]]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table(
        {
            "doc_a": pa.array(lo.astype(np.int64)),
            "doc_b": pa.array(hi.astype(np.int64)),
            "est_jaccard": pa.array(np.round(match[keep], 6)),
        }
    )


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    *,
    num_perm: int = 64,
    n_bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.5,
    concurrency: int = 4,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Near-duplicate candidate pairs via MinHash + LSH banding. Pairs are
    deduplicated across bands by a final exact dedup on (doc_a, doc_b)."""
    from functools import partial

    from odibel_ray.ops.relational import exact_dedup

    sig_ds = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm, "n_bands": n_bands, "shingle": shingle
        },
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    pairs = sig_ds.groupby(["band", "band_hash"]).map_groups(
        partial(_pairs_in_bucket, threshold=threshold, num_perm=num_perm),
        batch_format="pyarrow",
    )
    return exact_dedup(pairs, ["doc_a", "doc_b"], tie_break="est_jaccard")


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard (verification kernel for candidate pairs)."""
    ta, tb = text_a.split(" "), text_b.split(" ")
    sa = {" ".join(ta[i : i + n]) for i in range(max(len(ta) - n + 1, 0))}
    sb = {" ".join(tb[i : i + n]) for i in range(max(len(tb) - n + 1, 0))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def verify_pairs_jaccard(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    *,
    n: int = 3,
    threshold: float = 0.5,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Verify candidate pairs with exact n-gram Jaccard. Texts are broadcast as
    a doc_id→text lookup (test scale; at 100 TB this becomes two keyed joins
    against the documents table)."""
    from odibel_ray.ops.relational import _broadcast, _deref, _small_table

    lookup_t = _small_table(docs.select_columns(["doc_id", "text"]))
    ref = _broadcast(dict(zip(lookup_t["doc_id"].to_pylist(), lookup_t["text"].to_pylist())))

    def verify(t: pa.Table, lut) -> pa.Table:
        lut = _deref(lut)
        t = t.combine_chunks()
        a = t["doc_a"].to_pylist()
        b = t["doc_b"].to_pylist()
        jac = np.array(
            [ngram_jaccard(lut.get(x, ""), lut.get(y, ""), n) for x, y in zip(a, b)]
        )
        out = t.append_column("jaccard", pa.array(np.round(jac, 6)))
        return out.filter(pa.array(jac >= threshold))

    return pairs.map_batches(
        verify, fn_args=[ref], batch_format="pyarrow", batch_size=batch_size
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word hashes; near-dups share the simhash value on at
    least one of ``k_tables`` random bit-samplings (Hamming-tolerant LSH)."""

    def __init__(self, k_tables: int = 4, bits_per_table: int = 16, seed: int = 29):
        rng = np.random.default_rng(seed)
        self.masks = [
            rng.choice(64, size=bits_per_table, replace=False) for _ in range(k_tables)
        ]
        self.k_tables = k_tables

    @staticmethod
    def simhash(h: np.ndarray) -> np.uint64:
        if len(h) == 0:
            return np.uint64(0)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        v = bits.sum(axis=0) * 2 - len(h)
        return np.uint64(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        texts = t["text"].to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hashes = [
            pd.util.hash_array(np.array((s or "").split(" "), dtype=object), categorize=False)
            for s in texts
        ]
        sh = np.array([self.simhash(h) for h in hashes], dtype=np.uint64)
        n = len(ids)
        rows_id, rows_table, rows_key, rows_sim = [], [], [], []
        for k, mask in enumerate(self.masks):
            key = np.zeros(n, dtype=np.uint64)
            for bit_i, bit in enumerate(mask):
                key |= (((sh >> np.uint64(bit)) & np.uint64(1)) << np.uint64(bit_i))
            rows_id.append(ids)
            rows_table.append(np.full(n, k, dtype=np.int64))
            rows_key.append(key.astype(np.int64))
            rows_sim.append(sh.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(rows_id)),
                "table_id": pa.array(np.concatenate(rows_table)),
                "bucket_key": pa.array(np.concatenate(rows_key)),
                "simhash": pa.array(np.concatenate(rows_sim)),
            }
        )


def simhash_pairs(
    ds: "ray.data.Dataset",
    *,
    max_hamming: int = 8,
    k_tables: int = 4,
    bits_per_table: int = 16,
    concurrency: int = 4,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Near-dup pairs whose simhashes differ by ≤ ``max_hamming`` bits and that
    collide in at least one LSH table."""
    from odibel_ray.ops.relational import exact_dedup

    sig = ds.select_columns(["doc_id", "text"]).map_batches(
        SimHasher,
        fn_constructor_kwargs={"k_tables": k_tables, "bits_per_table": bits_per_table},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )

    def pairs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(ids, return_index=True)
        if len(uniq) < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        sh = t["simhash"].to_numpy(zero_copy_only=False)[idx].astype(np.uint64)
        ia, ib = np.triu_indices(len(uniq), k=1)
        x = sh[ia] ^ sh[ib]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        keep = ham <= max_hamming
        a, b = uniq[ia[keep]], uniq[ib[keep]]
        return pa.table(
            {
                "doc_a": pa.array(np.minimum(a, b).astype(np.int64)),
                "doc_b": pa.array(np.maximum(a, b).astype(np.int64)),
                "hamming": pa.array(ham[keep]),
            }
        )

    cand = sig.groupby(["table_id", "bucket_key"]).map_groups(pairs, batch_format="pyarrow")
    return exact_dedup(cand, ["doc_a", "doc_b"], tie_break="hamming")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds: "ray.data.Dataset",
    *,
    threshold: float = 0.95,
    k_tables: int = 12,
    planes_per_table: int = 4,
    seed: int = 47,
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """Near-duplicate vector pairs (cosine ≥ threshold) via multi-table
    random-hyperplane LSH + in-bucket exact cosine. ``k_tables`` independent
    tables of ``planes_per_table`` planes each — recall for a pair at angle θ is
    ``1 - (1 - (1-θ/π)^b)^L``; tune (b, L) to the threshold. One shuffle on
    ``(table_id, bucket_key)``; pairs found in several tables are deduped."""

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        dim = emb.shape[1]
        # deterministic planes (same seed in every task)
        planes = np.random.default_rng(seed).standard_normal(
            (k_tables, planes_per_table, dim)
        )
        parts = []
        for k in range(k_tables):
            key = ((emb @ planes[k].T) > 0) @ (1 << np.arange(planes_per_table))
            parts.append(
                pa.table(
                    {
                        "vec_id": t["vec_id"],
                        "table_id": pa.array(np.full(len(t), k, np.int64)),
                        "bucket_key": pa.array(key.astype(np.int64)),
                        "embedding": t["embedding"],
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sims = emb @ emb.T
        ia, ib = np.triu_indices(len(ids), k=1)
        s = sims[ia, ib]
        keep = s >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        return pa.table(
            {
                "vec_a": pa.array(np.minimum(a, b).astype(np.int64)),
                "vec_b": pa.array(np.maximum(a, b).astype(np.int64)),
                "cosine": pa.array(np.round(s[keep], 6)),
            }
        )

    from odibel_ray.ops.relational import exact_dedup

    b = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=batch_size)
    cand = b.groupby(["table_id", "bucket_key"]).map_groups(pairs, batch_format="pyarrow")
    return exact_dedup(cand, ["vec_a", "vec_b"], tie_break="cosine")
