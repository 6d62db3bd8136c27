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
documents; texts needed for verification are attached to the (tiny) candidate
pair stream by two keyed shuffle joins against the documents table — the full
corpus is never broadcast or driver-materialized.

All text kernels are flat-array vectorized: tokens are hashed ONCE per batch
(``pd.util.hash_array`` over the flattened token array of every doc), shingle
hashes are rolling combinations of consecutive token hashes (no shingle string
is ever materialized), and per-doc reductions are segmented numpy
(``np.minimum.reduceat`` over list offsets) — no per-doc Python loop anywhere.
"""

from __future__ import annotations

import logging
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_log = logging.getLogger("odibel_ray.dedup")

#: default per-bucket doc cap for CLUSTERING-feed pair enumeration
#: (``emit="spanning"``). A bucket with more docs than this emits star pairs
#: (every doc against the minimum doc_id) instead of all O(n²) pairs —
#: connectivity for clustering is preserved, the worker's memory stays O(n),
#: and the drop is logged. Degenerate buckets (millions of empty/boilerplate
#: docs sharing one band hash) are a real corpus pathology at 100 TB; without
#: the cap one `map_groups` task OOMs.
#:
#: Pair-emitting APIs (``minhash_lsh_pairs(emit="pairs")``, ``simhash_pairs``,
#: ``embedding_near_dups``) default to UNCAPPED: a silent star-pair collapse
#: there drops real verified pairs, i.e. reduces recall of the output itself,
#: not just of a connectivity feed. Callers opting into a cap get a ``capped``
#: marker column so the recall loss is visible in the data, not only in logs.
DEFAULT_MAX_BUCKET = 512

_MERSENNE = np.uint64((1 << 61) - 1)
_U64_MAX = np.iinfo(np.uint64).max
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _flat_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat token-hash array, per-doc token offsets) for a string column.

    One ``split_pattern`` + ONE ``pd.util.hash_array`` call for the whole
    batch — the flattened-array replacement for per-doc hashing loops.
    """
    toks = pc.split_pattern(pc.coalesce(texts, pa.scalar("")), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets)
    flat = toks.flatten()
    if len(flat) == 0:
        return np.array([], np.uint64), offs
    th = pd.util.hash_array(
        np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object), categorize=False
    )
    return th.astype(np.uint64), offs.astype(np.int64)


def _segment_arange(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]) ++ [0..lens[1]) ++ …, vectorized."""
    total = int(lens.sum())
    if total == 0:
        return np.array([], np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def _shingle_hashes_flat(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat shingle-hash array, per-doc shingle offsets).

    A shingle's hash is the rolling mix of its ``n`` token hashes — same
    identity as hashing the joined shingle string (same tokens → same hash)
    without materializing any shingle text.
    """
    th, offs = _flat_token_hashes(texts)
    lens = np.diff(offs)
    sh_lens = np.maximum(lens - n + 1, 0)
    sh_offs = np.concatenate(([0], np.cumsum(sh_lens))).astype(np.int64)
    T = len(th)
    if T < n or sh_offs[-1] == 0:
        return np.array([], np.uint64), sh_offs
    comb = np.zeros(T - n + 1, dtype=np.uint64)
    for j in range(n):  # n is tiny (3); the arrays are batch-sized
        comb = comb * _MIX + th[j : T - n + 1 + j]
    # valid shingle start positions: within-doc windows only
    starts = np.repeat(offs[:-1], sh_lens) + _segment_arange(sh_lens)
    return comb[starts], sh_offs


def _collapse_doc_grams(
    doc_idx: np.ndarray, gh: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Collapse flat per-position (doc, gram) pairs to one row per DISTINCT
    pair: returns ``(flat_firsts, counts)`` where ``flat_firsts`` indexes the
    first occurrence of each distinct pair back into the flat input arrays
    (in (doc, gram)-sorted order) and ``counts`` is its position count.
    One vectorized lexsort + run-length pass — the shared per-batch combiner
    of :func:`cross_doc_ngram_dup`, :func:`odibel_ray.lm.bigram_logprob` and
    :func:`odibel_ray.selection.dsir_weights`."""
    if len(doc_idx) == 0:
        return np.array([], np.int64), np.array([], np.int64)
    order = np.lexsort((gh, doc_idx))
    sd, sg = doc_idx[order], gh[order]
    new = np.empty(len(sd), dtype=bool)
    new[0] = True
    new[1:] = (sd[1:] != sd[:-1]) | (sg[1:] != sg[:-1])
    firsts = np.flatnonzero(new)
    counts = np.diff(np.append(firsts, len(sd)))
    return order[firsts], counts.astype(np.int64)


class MinHasher:
    """Actor-pool stage: doc → (doc_id, minhash signature, band keys).

    The permutation coefficients (a, b) are generated once per actor in
    ``__init__`` from a fixed seed — identical across actors, so signatures are
    globally consistent. Emits ``n_bands`` rows per doc (``flat_map``-style
    fan-out inside ``map_batches``): ``band``, ``band_hash``, ``doc_id``,
    ``sig`` (the full signature, for in-bucket est-jaccard verification).
    """

    #: shingle-chunk width for the (num_perm × chunk) permutation matrix —
    #: 64 perms × 65536 shingles × 8 B ≈ 32 MB per task, well under heap
    _CHUNK = 1 << 16

    def __init__(self, num_perm: int = 64, n_bands: int = 16, shingle: int = 3,
                 seed: int = 13, emit_sig: bool = True):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm, self.n_bands, self.shingle = num_perm, n_bands, shingle
        self.rows_per_band = num_perm // n_bands
        #: emit_sig=False ships only (doc_id, band, band_hash) through the
        #: banding shuffle — 24 B/row instead of ~540 B/row — for pipelines
        #: that exact-verify candidates anyway (no est-jaccard prefilter)
        self.emit_sig = emit_sig

    def signatures(self, flat: np.ndarray, sh_offs: np.ndarray) -> np.ndarray:
        """(n_docs, num_perm) minhash matrix via chunked outer-product +
        ``np.minimum.reduceat`` over doc segments — no per-doc loop."""
        n_docs = len(sh_offs) - 1
        sig = np.full((n_docs, self.num_perm), _U64_MAX, dtype=np.uint64)
        sh_lens = np.diff(sh_offs)
        nonempty = np.flatnonzero(sh_lens > 0)
        if len(nonempty) == 0:
            return sig
        lo = 0
        while lo < len(nonempty):
            # take docs until the chunk holds ~_CHUNK shingles (≥1 doc)
            hi = lo + 1
            base = sh_offs[nonempty[lo]]
            while hi < len(nonempty) and sh_offs[nonempty[hi] + 1] - base < self._CHUNK:
                hi += 1
            docs = nonempty[lo:hi]
            s0, s1 = sh_offs[docs[0]], sh_offs[docs[-1] + 1]
            h = flat[s0:s1]
            # a·h + b with natural uint64 wraparound — a valid permutation
            # family for minhash; the Mersenne mod would add a third full
            # pass of (slow, SIMD-less) uint64 division per chunk
            v = np.outer(self.a, h) + self.b[:, None]
            seg_starts = (sh_offs[docs] - s0).astype(np.int64)
            mins = np.minimum.reduceat(v, seg_starts, axis=1)  # (num_perm, len(docs))
            sig[docs] = mins.T
            lo = hi
        return sig

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        flat, sh_offs = _shingle_hashes_flat(t["text"], self.shingle)
        sigs = self.signatures(flat, sh_offs)  # (n_docs, num_perm)
        n = len(ids)
        r = self.rows_per_band
        band_sigs = sigs.reshape(n, self.n_bands, r)
        band_hash = np.zeros((n, self.n_bands), dtype=np.uint64)
        for j in range(r):
            band_hash = band_hash * _MIX + band_sigs[:, :, j]
        bands = np.tile(np.arange(self.n_bands, dtype=np.int64), n)
        cols = {
            "doc_id": pa.array(np.repeat(ids, self.n_bands)),
            "band": pa.array(bands),
            "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64)),
        }
        if self.emit_sig:
            rep = sigs.astype(np.int64)[np.repeat(np.arange(n), self.n_bands)]
            cols["sig"] = pa.FixedSizeListArray.from_arrays(
                pa.array(rep.reshape(-1), pa.int64()), self.num_perm
            )
        return pa.table(cols)


def _bucket_pair_indices(
    n: int, max_bucket: int | None, what: str
) -> tuple[np.ndarray, np.ndarray]:
    """Pair index arrays (ia, ib) for an n-doc bucket, O(n²)-guarded.

    ``max_bucket is None`` (uncapped) or ``n <= max_bucket`` → all
    ``n(n-1)/2`` pairs (``np.triu_indices``).
    Oversized buckets collapse to ``n-1`` star pairs against index 0 (the
    minimum doc id — callers pass ids sorted ascending), preserving
    connected-component connectivity while bounding both the output and the
    kernel's working set at O(n). The drop is logged with counts so a capped
    run is auditable, never silent.
    """
    if max_bucket is None or n <= max_bucket:
        return np.triu_indices(n, k=1)
    _log.warning(
        "%s bucket capped: %d docs > max_bucket=%d; emitting %d star pairs "
        "(dropping %d of %d full pairs)",
        what, n, max_bucket, n - 1, n * (n - 1) // 2 - (n - 1), n * (n - 1) // 2,
    )
    return np.zeros(n - 1, dtype=np.int64), np.arange(1, n, dtype=np.int64)


def _local_spanning_edges(
    n: int, ia: np.ndarray, ib: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Spanning edges (root index → member index) of the local graph on ``n``
    nodes with edges (ia, ib) — vectorized min-label propagation with pointer
    jumping (no per-edge Python loop). The returned edge set has identical
    connectivity to the input but only O(n) edges; roots are the minimum node
    index of each component."""
    labels = np.arange(n, dtype=np.int64)
    while True:
        prev = labels.copy()
        np.minimum.at(labels, ia, labels[ib])
        np.minimum.at(labels, ib, labels[ia])
        labels = labels[labels]  # pointer jump
        if np.array_equal(labels, prev):
            break
    member = np.flatnonzero(labels != np.arange(n))
    return labels[member], member


def _pairs_in_bucket(
    t: pa.Table,
    threshold: float,
    num_perm: int,
    max_bucket: int | None = None,
    emit: str = "pairs",
) -> pa.Table:
    """Candidate pairs inside one (band, band_hash) bucket. With signatures
    present, estimated Jaccard = fraction of matching minhash positions and
    pairs below ``threshold`` are dropped; without (``emit_sig=False``), every
    in-bucket pair is a candidate for downstream exact verification. With a
    ``max_bucket`` cap, larger buckets are reduced to star pairs (see
    :func:`_bucket_pair_indices`) and — for ``emit="pairs"`` — every output
    row carries a ``capped`` marker so downstream consumers can see which
    pairs came from a recall-reduced bucket.

    ``emit="spanning"``: instead of the kept pairs themselves, emit spanning
    edges of the kept-pair graph's local components (O(n) rows instead of up
    to O(n²), columns doc_a/doc_b only). Connectivity is preserved exactly —
    the union over buckets of per-bucket spanning edges has the same global
    connected components as the union of per-bucket kept pairs — so this is
    the right feed for clustering (the edges themselves may be synthetic
    root→member links, not verified near-dup pairs)."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    has_sig = "sig" in t.column_names and emit != "spanning"
    mark_capped = emit == "pairs" and max_bucket is not None
    uniq, idx = np.unique(ids, return_index=True)
    cols = {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    if has_sig:
        cols["est_jaccard"] = pa.array([], pa.float64())
    if mark_capped:
        cols["capped"] = pa.array([], pa.bool_())
    if len(uniq) < 2:
        return pa.table(cols)
    n = len(uniq)
    ia, ib = _bucket_pair_indices(n, max_bucket, "minhash band")
    if "sig" in t.column_names:
        sigs = np.stack(t["sig"].to_numpy(zero_copy_only=False)[idx])
        match = (sigs[ia] == sigs[ib]).mean(axis=1)
        keep = match >= threshold
        ia, ib = ia[keep], ib[keep]
    if emit == "spanning":
        # roots carry the min index == min doc id (uniq is sorted ascending)
        ra, rb = _local_spanning_edges(n, ia, ib)
        return pa.table(
            {
                "doc_a": pa.array(uniq[ra].astype(np.int64)),
                "doc_b": pa.array(uniq[rb].astype(np.int64)),
            }
        )
    a, b = uniq[ia], uniq[ib]
    out = {
        "doc_a": pa.array(np.minimum(a, b).astype(np.int64)),
        "doc_b": pa.array(np.maximum(a, b).astype(np.int64)),
    }
    if has_sig:
        out["est_jaccard"] = pa.array(np.round(match[keep], 6))
    if mark_capped:
        out["capped"] = pa.array(np.full(len(a), n > max_bucket))
    return pa.table(out)


_HASHER_CACHE: dict = {}


def _minhash_batch(t: pa.Table, **kw) -> pa.Table:
    """Task-based MinHasher with once-per-worker-process construction (module
    cache) — the per-actor-``__init__`` property of the actor-pool pattern
    without paying actor-pool spin-up on every pipeline run (the hasher state
    is a few KB of seeded coefficients)."""
    key = tuple(sorted(kw.items()))
    hasher = _HASHER_CACHE.get(key)
    if hasher is None:
        hasher = _HASHER_CACHE.setdefault(key, MinHasher(**kw))
    return hasher(t)


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    *,
    num_perm: int = 64,
    n_bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.5,
    concurrency: int | None = None,
    batch_size: int = 1024,
    est_filter: bool = True,
    max_bucket: int | None | str = "auto",
    dedup: bool = True,
    emit: str = "pairs",
) -> "ray.data.Dataset":
    """Near-duplicate candidate pairs via MinHash + LSH banding. Pairs are
    deduplicated across bands by a final exact dedup on (doc_a, doc_b).

    ``max_bucket="auto"`` resolves per output kind: ``emit="pairs"`` runs
    UNCAPPED (a star-pair collapse would silently drop real candidate pairs
    — recall of the verified output matters more than the O(n²) guard, which
    the caller can still opt into), while ``emit="spanning"`` caps at
    :data:`DEFAULT_MAX_BUCKET` (connectivity survives the cap, so the
    clustering feed keeps the degenerate-bucket OOM guard). An explicit int
    caps either mode; pair outputs then carry a per-row ``capped`` marker
    column identifying rows from recall-reduced buckets. ``None`` is always
    uncapped.

    ``dedup=False`` skips the cross-band pair dedup exchange and returns the
    raw candidate stream (a pair seen in k bands appears k times) — for
    consumers that dedup for free inside their own keyed exchange
    (:func:`verify_pairs_jaccard` dedups in its first join bucket). Keep the
    default for consumers that re-shuffle the pairs repeatedly (connected
    components touches the edge set every round — duplicate edges would
    inflate every round's all-to-all, so one dedup exchange up front wins).

    ``emit="spanning"``: per-bucket spanning edges of the kept-pair graph
    instead of the pairs (O(docs) rows per bucket instead of O(docs²); same
    global connected components) — the scale feed for clustering, where a
    clique of k near-identical docs must not cost k²/2 edge rows in every
    CC round's shuffle. Output columns are doc_a/doc_b only.

    ``est_filter=False`` skips the in-bucket estimated-jaccard prefilter and
    ships NO signatures through the banding shuffle (24 B/row vs ~540 B/row)
    — right when the caller exact-verifies candidates anyway
    (:func:`verify_pairs_jaccard`). ``concurrency`` switches the signature
    stage to an actor pool; default is task-based with once-per-process
    hasher construction."""
    from functools import partial

    from odibel_ray.ops.relational import exact_dedup

    if max_bucket == "auto":
        max_bucket = DEFAULT_MAX_BUCKET if emit == "spanning" else None
    hasher_kw = dict(
        num_perm=num_perm, n_bands=n_bands, shingle=shingle, emit_sig=est_filter
    )
    src = ds.select_columns(["doc_id", "text"])
    if concurrency:
        sig_ds = src.map_batches(
            MinHasher,
            fn_constructor_kwargs=hasher_kw,
            concurrency=concurrency,
            batch_size=batch_size,
            batch_format="pyarrow",
        )
    else:
        sig_ds = src.map_batches(
            partial(_minhash_batch, **hasher_kw),
            batch_size=batch_size,
            batch_format="pyarrow",
        )
    pairs = sig_ds.groupby(["band", "band_hash"]).map_groups(
        partial(
            _pairs_in_bucket,
            threshold=threshold,
            num_perm=num_perm,
            max_bucket=max_bucket,
            emit=emit,
        ),
        batch_format="pyarrow",
    )
    if not dedup:
        return pairs
    tie = "est_jaccard" if (est_filter and emit != "spanning") else None
    return exact_dedup(pairs, ["doc_a", "doc_b"], tie_break=tie)


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard (reference kernel, used in tests)."""
    ta, tb = text_a.split(" "), text_b.split(" ")
    sa = {" ".join(ta[i : i + n]) for i in range(max(len(ta) - n + 1, 0))}
    sb = {" ".join(tb[i : i + n]) for i in range(max(len(tb) - n + 1, 0))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def _seg_unique(ids: np.ndarray, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (segment, hash) rows, sorted — vectorized set-ification."""
    order = np.lexsort((h, ids))
    ids, h = ids[order], h[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (ids[1:] != ids[:-1]) | (h[1:] != h[:-1])
    return ids[keep], h[keep]


def _jaccard_from_hashes(
    ha: np.ndarray, offa: np.ndarray, hb: np.ndarray, offb: np.ndarray
) -> np.ndarray:
    """Per-pair Jaccard of two shingle-hash multisets (row i of side A vs row i
    of side B), fully vectorized: per-segment dedup, then a sort-merge
    intersection count over the concatenated (pair, hash) streams."""
    npairs = len(offa) - 1
    ida = np.repeat(np.arange(npairs, dtype=np.int64), np.diff(offa))
    idb = np.repeat(np.arange(npairs, dtype=np.int64), np.diff(offb))
    ida, ha = _seg_unique(ida, ha)
    idb, hb = _seg_unique(idb, hb)
    na = np.bincount(ida, minlength=npairs)
    nb = np.bincount(idb, minlength=npairs)
    ids = np.concatenate([ida, idb])
    h = np.concatenate([ha, hb])
    order = np.lexsort((h, ids))
    ids, h = ids[order], h[order]
    if len(ids) == 0:
        return np.ones(npairs)  # both sides empty everywhere
    dup = (ids[1:] == ids[:-1]) & (h[1:] == h[:-1])
    inter = np.bincount(ids[1:][dup], minlength=npairs)
    union = na + nb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def verify_pairs_jaccard(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    *,
    n: int = 3,
    threshold: float = 0.5,
    batch_size: int = 4096,
    num_partitions: int | None = None,
    pair_schema: pa.Schema | None = None,
) -> "ray.data.Dataset":
    """Verify candidate pairs with exact n-gram Jaccard (hash-set identity —
    64-bit shingle hashes stand in for shingle strings, collision probability
    ~n_shingles²/2⁶⁴ per doc).

    Scale shape: texts are attached to the (near-dup-sized) pair stream by two
    keyed shuffle joins against the documents table (task-based
    :func:`odibel_ray.ops.relational.bucketed_join` — never a full-corpus
    broadcast) and the Jaccard kernel is flat-array segmented numpy. The
    first join dedups the pair stream in-bucket (``left_distinct`` on
    doc_a/doc_b — every copy of a pair shares doc_a, so they co-locate), so
    callers can feed raw multi-band LSH candidates
    (``minhash_lsh_pairs(..., dedup=False)``) and skip that pipeline's
    dedicated dedup exchange.

    ``pair_schema``: Arrow schema of ``pairs`` (must include doc_a/doc_b);
    defaults to the MinHash candidate shape (doc_a, doc_b, est_jaccard).
    """
    from odibel_ray.ops.relational import bucketed_join

    nb = num_partitions or 32
    d = docs.select_columns(["doc_id", "text"])
    pair_schema = pair_schema or pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("est_jaccard", pa.float64())]
    )
    text_schema = lambda c, tc: pa.schema([(c, pa.int64()), (tc, pa.string())])  # noqa: E731
    p = bucketed_join(
        pairs,
        d.rename_columns({"doc_id": "doc_a", "text": "_text_a"}),
        "doc_a",
        num_buckets=nb,
        left_schema=pair_schema,
        right_schema=text_schema("doc_a", "_text_a"),
        left_distinct=["doc_a", "doc_b"],
        # cross-band copies from a capped + an uncapped bucket keep
        # capped=True deterministically (any-copy-capped semantics)
        left_distinct_max=(
            ["capped"] if pair_schema.get_field_index("capped") >= 0 else None
        ),
    )
    p = bucketed_join(
        p,
        d.rename_columns({"doc_id": "doc_b", "text": "_text_b"}),
        "doc_b",
        num_buckets=nb,
        left_schema=pair_schema.append(pa.field("_text_a", pa.string())),
        right_schema=text_schema("doc_b", "_text_b"),
    )

    def verify(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if len(t) == 0:
            return t.drop_columns(["_text_a", "_text_b"]).append_column(
                "jaccard", pa.array([], pa.float64())
            )
        ha, offa = _shingle_hashes_flat(t["_text_a"], n)
        hb, offb = _shingle_hashes_flat(t["_text_b"], n)
        jac = _jaccard_from_hashes(ha, offa, hb, offb)
        out = t.drop_columns(["_text_a", "_text_b"]).append_column(
            "jaccard", pa.array(np.round(jac, 6))
        )
        return out.filter(pa.array(jac >= threshold))

    return p.map_batches(verify, batch_format="pyarrow", batch_size=batch_size)


def corpus_dedup_survivors(
    docs: "ray.data.Dataset",
    *,
    threshold: float = 0.5,
    n: int = 3,
    keep_cols: tuple[str, ...] = ("doc_id",),
    keep_schema: pa.Schema | None = None,
    verify: bool = True,
    **lsh_kw,
) -> "ray.data.Dataset":
    """End-to-end near-dup corpus dedup: LSH candidates → (optional) exact
    n-gram Jaccard verify → size-adaptive connected components → keep each
    duplicate group's min-id representative, anti-join the rest out of the
    corpus. Returns the surviving rows projected to ``keep_cols``.

    ``verify=True`` (default) inserts :func:`verify_pairs_jaccard` between
    candidate generation and clustering, so documents are only ever dropped
    on EXACT duplicate evidence — at 100-TB scale the MinHash estimator's
    variance would otherwise delete false-positive "duplicates" (a pair with
    estimated Jaccard ≥ t but true Jaccard < t severs a real document). The
    verified path feeds raw multi-band candidates (``dedup=False`` — the
    verify join's first bucket dedups them for free) with no signature
    shipping (``est_filter=False``). ``verify=False`` keeps the cheaper
    estimate-only path (spanning edges straight into CC) for callers that
    accept estimator-variance deletions.

    Components are min-label, so the drop list is exactly the CC rows with
    ``node != component`` — a near-dup-member-sized build side fed to the
    guarded anti join (automatic bucketed fallback above the byte budget)."""
    from odibel_ray.ops.relational import broadcast_anti_join
    from odibel_ray.state import connected_components_auto

    if verify:
        cand = minhash_lsh_pairs(
            docs, threshold=threshold, est_filter=False, dedup=False, **lsh_kw
        )
        edges = verify_pairs_jaccard(
            cand,
            docs,
            n=n,
            threshold=threshold,
            pair_schema=pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]),
        ).select_columns(["doc_a", "doc_b"])
    else:
        edges = minhash_lsh_pairs(docs, threshold=threshold, emit="spanning", **lsh_kw)
    comp = connected_components_auto(edges)

    def _members(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        t = t.filter(pc.not_equal(t["node"], t["component"]))
        return pa.table({"doc_id": t["node"]})

    drop = comp.map_batches(_members, batch_format="pyarrow")
    return broadcast_anti_join(
        docs.select_columns(list(keep_cols)), drop, "doc_id", ds_schema=keep_schema
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word hashes; near-dups share the simhash value on at
    least one of ``k_tables`` random bit-samplings (Hamming-tolerant LSH)."""

    def __init__(
        self,
        k_tables: int = 4,
        bits_per_table: int = 16,
        seed: int = 29,
        bands: str = "sampled",
    ):
        if bands == "disjoint":
            # consecutive non-overlapping bit slices — the pigeonhole banding:
            # a pair with Hamming distance d differs in at most d bands, so any
            # pair with d < k_tables collides in at least one band. With
            # k_tables * bits_per_table == 64 this gives GUARANTEED full recall
            # for max_hamming <= k_tables - 1 (the oracle-pinnable mode).
            if k_tables * bits_per_table > 64:
                raise ValueError("disjoint bands must fit in the 64-bit simhash")
            self.masks = [
                np.arange(k * bits_per_table, (k + 1) * bits_per_table)
                for k in range(k_tables)
            ]
        elif bands == "sampled":
            rng = np.random.default_rng(seed)
            self.masks = [
                rng.choice(64, size=bits_per_table, replace=False)
                for _ in range(k_tables)
            ]
        else:
            raise ValueError(f"bands must be 'sampled' or 'disjoint', got {bands!r}")
        self.k_tables = k_tables

    @staticmethod
    def simhash_flat(th: np.ndarray, offs: np.ndarray) -> np.ndarray:
        """Per-doc 64-bit simhash from the flat token-hash array: the bit
        matrix is uint8 via ``np.unpackbits`` over the little-endian byte view
        (64 B/token, not the 512 B/token an int64 shift matrix costs) and the
        per-doc ±1 sums are segmented ``np.add.reduceat`` accumulated in int64
        — no per-doc loop."""
        n_docs = len(offs) - 1
        out = np.zeros(n_docs, dtype=np.uint64)
        lens = np.diff(offs)
        nonempty = np.flatnonzero(lens > 0)
        if len(th) == 0 or len(nonempty) == 0:
            return out
        # (n_tokens, 64) uint8, column j == bit j of the token hash
        bits = np.unpackbits(
            th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        sums = np.add.reduceat(
            bits, offs[nonempty].astype(np.int64), axis=0, dtype=np.int64
        )
        v = sums * 2 - lens[nonempty][:, None]
        shifts = np.arange(64, dtype=np.uint64)
        out[nonempty] = ((v > 0).astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        th, offs = _flat_token_hashes(t["text"])
        sh = self.simhash_flat(th, offs)
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


def _simhash_batch(t: pa.Table, **kw) -> pa.Table:
    """Task-based SimHasher with once-per-worker-process construction — same
    cached-constructor pattern as :func:`_minhash_batch`; the hasher state is
    a few hundred bytes of seeded bit masks, so an actor pool only adds
    spin-up latency."""
    key = ("simhash",) + tuple(sorted(kw.items()))
    hasher = _HASHER_CACHE.get(key)
    if hasher is None:
        hasher = _HASHER_CACHE.setdefault(key, SimHasher(**kw))
    return hasher(t)


def simhash_pairs(
    ds: "ray.data.Dataset",
    *,
    max_hamming: int = 8,
    k_tables: int = 4,
    bits_per_table: int = 16,
    bands: str = "sampled",
    concurrency: int | None = None,
    batch_size: int = 1024,
    max_bucket: int | None = None,
) -> "ray.data.Dataset":
    """Near-dup pairs whose simhashes differ by ≤ ``max_hamming`` bits and that
    collide in at least one LSH table. Uncapped by default — this is a
    pair-emitting API, and a star-pair collapse would silently drop real
    near-dup pairs. An explicit ``max_bucket`` opts into the O(n²) guard
    (oversized buckets reduce to star pairs) and adds a per-row ``capped``
    marker column flagging pairs from recall-reduced buckets. ``concurrency``
    opts into an actor pool; default is task-based with a once-per-process
    cached hasher.

    ``bands="disjoint"`` partitions the 64 signature bits into ``k_tables``
    consecutive bands instead of random samplings: recall is then EXACT by
    pigeonhole for ``max_hamming < k_tables`` (the output equals the full
    all-pairs Hamming answer), at the cost of narrower bucket keys —
    ``2**bits_per_table`` buckets per band bounds the banding parallelism, so
    prefer the sampled default when the corpus is huge and probabilistic
    recall suffices."""
    from functools import partial

    from odibel_ray.ops.relational import exact_dedup

    if bands == "disjoint" and max_hamming >= k_tables:
        raise ValueError(
            f"disjoint banding guarantees recall only for max_hamming < k_tables "
            f"(got max_hamming={max_hamming}, k_tables={k_tables})"
        )
    hasher_kw = {"k_tables": k_tables, "bits_per_table": bits_per_table, "bands": bands}
    src = ds.select_columns(["doc_id", "text"])
    if concurrency:
        sig = src.map_batches(
            SimHasher,
            fn_constructor_kwargs=hasher_kw,
            concurrency=concurrency,
            batch_size=batch_size,
            batch_format="pyarrow",
        )
    else:
        sig = src.map_batches(
            partial(_simhash_batch, **hasher_kw),
            batch_size=batch_size,
            batch_format="pyarrow",
        )

    def pairs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(ids, return_index=True)
        if len(uniq) < 2:
            cols = {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
            if max_bucket is not None:
                cols["capped"] = pa.array([], pa.bool_())
            return pa.table(cols)
        sh = t["simhash"].to_numpy(zero_copy_only=False)[idx].astype(np.uint64)
        ia, ib = _bucket_pair_indices(len(uniq), max_bucket, "simhash")
        x = sh[ia] ^ sh[ib]
        # vectorized popcount: bytes view → unpackbits → per-word sum
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        keep = ham <= max_hamming
        a, b = uniq[ia[keep]], uniq[ib[keep]]
        out = {
            "doc_a": pa.array(np.minimum(a, b).astype(np.int64)),
            "doc_b": pa.array(np.maximum(a, b).astype(np.int64)),
            "hamming": pa.array(ham[keep]),
        }
        if max_bucket is not None:
            out["capped"] = pa.array(np.full(len(a), len(uniq) > max_bucket))
        return pa.table(out)

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
    max_bucket: int | None = None,
) -> "ray.data.Dataset":
    """Near-duplicate vector pairs (cosine ≥ threshold) via multi-table
    random-hyperplane LSH + in-bucket exact cosine. ``k_tables`` independent
    tables of ``planes_per_table`` planes each — recall for a pair at angle θ is
    ``1 - (1 - (1-θ/π)^b)^L``; tune (b, L) to the threshold. One shuffle on
    ``(table_id, bucket_key)``; pairs found in several tables are deduped.

    Uncapped by default — the output is threshold-verified pairs, and a
    star-pair collapse both drops pairs and (because star edges are
    hub-filtered) can lose qualifying pairs entirely. An explicit
    ``max_bucket`` opts into the O(n²) guard: oversized buckets emit their
    star edges UNFILTERED (no threshold applied — the hub cosine says nothing
    about non-hub pairs) with ``capped=True``, so the consumer sees exactly
    which edges are connectivity hints rather than verified near-dups."""

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
            cols = {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
            if max_bucket is not None:
                cols["capped"] = pa.array([], pa.bool_())
            return pa.table(cols)
        emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        # ids sorted ascending so the star hub (index 0) is the min vec_id
        order = np.argsort(ids, kind="stable")
        ids, emb = ids[order], emb[order]
        ia, ib = _bucket_pair_indices(len(ids), max_bucket, "embedding LSH")
        was_capped = max_bucket is not None and len(ids) > max_bucket
        if not was_capped:
            s = (emb @ emb.T)[ia, ib]
            keep = s >= threshold
        else:
            # star pairs only: hub vs rest, O(n·dim). NOT threshold-filtered —
            # these are connectivity hints, flagged capped=True below
            s = emb[1:] @ emb[0]
            keep = np.ones(len(s), dtype=bool)
        a, b = ids[ia[keep]], ids[ib[keep]]
        out = {
            "vec_a": pa.array(np.minimum(a, b).astype(np.int64)),
            "vec_b": pa.array(np.maximum(a, b).astype(np.int64)),
            "cosine": pa.array(np.round(s[keep], 6)),
        }
        if max_bucket is not None:
            out["capped"] = pa.array(np.full(len(a), was_capped))
        return pa.table(out)

    from odibel_ray.ops.relational import exact_dedup

    b = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=batch_size)
    cand = b.groupby(["table_id", "bucket_key"]).map_groups(pairs, batch_format="pyarrow")
    return exact_dedup(cand, ["vec_a", "vec_b"], tie_break="cosine")


# ---------------------------------------------------------------------------
# Train/test decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    train: "ray.data.Dataset",
    test: "ray.data.Dataset",
    *,
    shingle: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    emit: str = "hits",
    min_hits: int = 1,
    num_buckets: int | None = None,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Benchmark decontamination: find (or drop) training documents sharing
    word-``shingle``-grams with an evaluation/test corpus — the GPT-3/Llama
    n-gram-overlap sweep every LLM training pipeline runs before training
    (the reference has no training-data ops; this extends its profile suite).

    Both corpora shingle with the same rolling token-hash identity as the
    MinHash path (`_shingle_hashes_flat` — equal token windows ⇒ equal
    hashes, no shingle strings materialized). The train side ships distinct
    ``(id, shingle)`` rows, the test side distinct shingle hashes; a
    hash-bucketed SEMI join (each side moves exactly once, no broadcast —
    both corpora may be huge) keeps every train shingle that appears
    anywhere in the test set, and a partial per-batch count + tiny groupby
    folds them to per-document hit counts.

    ``emit="hits"`` → ``(id_col, hits)`` rows for documents with
    ``hits >= min_hits`` (hits = distinct contaminated shingles).
    ``emit="clean"`` → the train rows with those documents REMOVED (anti
    join on the id, same bucketed shuffle machinery).
    """
    from odibel_ray.ops.relational import bucketed_join

    if emit not in ("hits", "clean"):
        raise ValueError("emit must be 'hits' or 'clean'")
    train_schema = train.schema().base_schema
    id_type = train_schema.field(id_col).type

    def _train_sh(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        flat, sh_offs = _shingle_hashes_flat(t[text_col], shingle)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), np.diff(sh_offs))
        u_idx, u_sh = _seg_unique(idx, flat)  # per-doc distinct shingles
        return pa.table({
            id_col: t[id_col].take(pa.array(u_idx)),
            "sh": pa.array(u_sh, pa.uint64()),
        })

    def _test_sh(t: pa.Table) -> pa.Table:
        flat, _ = _shingle_hashes_flat(t[text_col], shingle)
        return pa.table({"sh": pa.array(np.unique(flat), pa.uint64())})

    tr = train.map_batches(_train_sh, batch_format="pyarrow", batch_size=batch_size)
    te = test.map_batches(_test_sh, batch_format="pyarrow", batch_size=batch_size)
    # SEMI join: a train shingle matches at most once however many test docs
    # carry it, so the test side needs no global distinct pass
    matched = bucketed_join(
        tr, te, on="sh", how="semi", num_buckets=num_buckets,
        left_schema=pa.schema([(id_col, id_type), ("sh", pa.uint64())]),
        right_schema=pa.schema([("sh", pa.uint64())]),
    )

    def _partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select([id_col]), id_col).aggregate([([], "count_all")])
        return g.rename_columns([id_col, "hits"])

    def _finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns([id_col, "hits"])
        t = t.set_column(1, "hits", pc.cast(t["hits"], pa.int64()))
        return t.filter(pc.greater_equal(t["hits"], min_hits))

    hits = (
        matched.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .groupby(id_col).sum("hits")
        .map_batches(_finish, batch_format="pyarrow")
    )
    if emit == "hits":
        return hits
    return bucketed_join(
        train, hits, on=id_col, how="anti",
        left_schema=train_schema,
        right_schema=pa.schema([(id_col, id_type), ("hits", pa.int64())]),
    )


def cross_doc_ngram_dup(
    docs: "ray.data.Dataset",
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = ("source",),
    min_docs: int = 2,
    num_buckets: int | None = None,
    batch_size: int = 65536,
    id_type: pa.DataType | None = None,
    carry_types: dict[str, pa.DataType] | None = None,
) -> "ray.data.Dataset":
    """Cross-document n-gram duplication profile — the corpus-level
    "duplicated substring" measure of exact-substring dedup (Lee et al. 2022,
    *Deduplicating Training Data Makes Language Models Better*), distinct from
    the WITHIN-doc Gopher repetition in :func:`odibel_ray.text.repetition_stats`.

    Per doc with at least ``n`` tokens, returns one row:
    ``(id_col, *carry, n_grams, n_dup)`` where ``n_grams`` is the number of
    token n-gram positions and ``n_dup`` the number of those positions whose
    n-gram also occurs in at least ``min_docs`` DISTINCT documents corpus-wide.
    ``n_dup / n_grams`` is the doc's duplicated fraction — the usual filter /
    span-removal signal.

    Scale shape (the honest cost of substring-level dedup — the working set is
    one row per (doc, distinct n-gram), never the corpus text), a SINGLE
    consumption of ``docs`` and exactly two exchanges:

    1. one ``map_batches`` pass emits ``(gram_key, doc, n_pos)`` — n-grams are
       ROLLING HASHES over the flat token-hash array (no gram string is ever
       materialized), per-(doc, gram) position counts collapse duplicates
       within the doc before anything is shuffled;
    2. ONE gram-hash-bucket groupby co-locates every row of a gram; inside
       each bucket the distinct-doc count per gram is a vectorized bincount
       (rows are per-(doc, gram) unique, so row count IS the doc count),
       duplicated positions are marked, and the bucket pre-folds to one row
       per (doc, bucket) — the self-join-free replacement for the previous
       count→``bucketed_join`` shape, which consumed the gram stream twice
       (re-executing the upstream read/dedup) and paid a third exchange;
    3. ``groupby(doc)`` sums the per-bucket partials into the per-doc profile.

    Reference parity: this generalizes the reference's content-hash dedup
    (``utils/WikiUtil.scala:13-30``) from whole-document identity to
    substring-level overlap.
    """
    from ray.data.aggregate import Max, Sum

    from odibel_ray.tuning import default_num_buckets

    carry = tuple(carry)
    if id_type is None:
        id_type = pa.int64()
    nb = default_num_buckets(num_buckets)

    def _emit(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        gh, offs = _shingle_hashes_flat(t[text_col], n)
        lens = np.diff(offs)
        ndocs = len(t)
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
        if len(gh) == 0:
            cols = {
                "_gb": pa.array([], pa.int64()),
                "gram_key": pa.array([], pa.int64()),
                id_col: pa.array([], id_type),
                "n_pos": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
            }
            for c in carry:
                cols[c] = t[c].slice(0, 0)
            return pa.table(cols)
        # collapse duplicate grams within each doc, keeping position counts
        flat_firsts, counts = _collapse_doc_grams(doc_idx, gh)
        ud, ug = doc_idx[flat_firsts], gh[flat_firsts]
        cols = {
            # shuffle bucket: pure function of the gram key, so every row of
            # a gram co-locates and the in-bucket row count per gram is its
            # corpus-wide distinct-doc count
            "_gb": pa.array((ug % np.uint64(nb)).astype(np.int64)),
            "gram_key": pa.array(ug.view(np.int64), pa.int64()),
            id_col: t[id_col].take(pa.array(ud)),
            "n_pos": pa.array(counts, pa.int64()),
            # total gram positions of the doc, replicated per row: lets the
            # final per-doc groupby recover the denominator without a second
            # pass over the text
            "n_grams": pa.array(lens[ud].astype(np.int64), pa.int64()),
        }
        for c in carry:
            cols[c] = t[c].take(pa.array(ud))
        return pa.table(cols)

    grams = docs.map_batches(_emit, batch_format="pyarrow", batch_size=batch_size)

    def _mark_fold(g: pa.Table) -> pa.Table:
        """One gram-hash bucket: mark duplicated grams (in-bucket distinct-doc
        bincount — complete, because the bucket is a pure function of the
        gram key) and pre-fold to one row per (doc, bucket)."""
        g = g.combine_chunks()
        out_cols = [id_col, "dup_pos", "n_grams", *carry]
        if len(g) == 0:
            empty = {
                id_col: pa.array([], id_type),
                "dup_pos": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
            }
            ctypes = carry_types or {}
            for c in carry:
                empty[c] = (
                    g[c].slice(0, 0)
                    if c in g.column_names
                    else pa.array([], ctypes.get(c, pa.string()))
                )
            return pa.table({c: empty[c] for c in out_cols})
        gk = g["gram_key"].to_numpy(zero_copy_only=False)
        _, inv, nd = np.unique(gk, return_inverse=True, return_counts=True)
        dup = nd[inv] >= min_docs
        dup_pos = g["n_pos"].to_numpy(zero_copy_only=False) * dup
        ids = g[id_col].to_numpy(zero_copy_only=False)
        uid, dinv = np.unique(ids, return_inverse=True)
        sums = np.bincount(dinv, weights=dup_pos, minlength=len(uid))
        firsts = np.zeros(len(uid), np.int64)
        firsts[dinv[::-1]] = np.arange(len(g) - 1, -1, -1, dtype=np.int64)
        take = pa.array(firsts)
        cols = {
            id_col: g[id_col].take(take),
            "dup_pos": pa.array(sums.astype(np.int64)),
            "n_grams": g["n_grams"].take(take),
        }
        for c in carry:
            cols[c] = g[c].take(take)
        return pa.table({c: cols[c] for c in out_cols})

    per_bucket = grams.groupby("_gb").map_groups(_mark_fold, batch_format="pyarrow")
    aggs = [
        Sum("dup_pos", alias_name="n_dup"),
        Max("n_grams", alias_name="n_grams"),
    ] + [Max(c, alias_name=c) for c in carry]
    per_doc = per_bucket.groupby(id_col).aggregate(*aggs)

    def _order(t: pa.Table) -> pa.Table:
        return t.select([id_col, *carry, "n_grams", "n_dup"])

    return per_doc.map_batches(_order, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cross-document chunk-level exact dedup (C4-style line dedup)
# ---------------------------------------------------------------------------


def split_chunks(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Explode documents into non-overlapping ``window``-token chunks:
    one row per chunk ``(id, chunk_idx, chunk_text, n_chunks)``.

    The corpus-scale analog of C4's line split (Raffel et al. 2020 dedupe
    "any three-sentence span"; lines generalize to fixed token windows for
    newline-free corpora). Fully vectorized: tokens split once per batch,
    chunk boundaries are a numpy offset computation over the flattened token
    array, chunk strings come out of ONE ``pc.binary_join`` — no per-doc
    Python loop.
    """

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern(t[text_col], pattern=" ").combine_chunks()
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        counts = np.diff(offsets)
        n_chunks = np.maximum((counts + window - 1) // window, 1)
        total = int(n_chunks.sum())
        doc_of_chunk = np.repeat(np.arange(len(t)), n_chunks)
        chunk_idx = np.arange(total) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        starts = offsets[:-1][doc_of_chunk] + chunk_idx * window
        # chunks are contiguous in the flat token array, so every chunk's end
        # is the next chunk's start (the final end is the array's end)
        new_offsets = pa.array(np.append(starts, offsets[-1]), pa.int64())
        chunks = pa.LargeListArray.from_arrays(new_offsets, toks.values)
        ids = t[id_col].take(pa.array(doc_of_chunk))
        return pa.table(
            {
                id_col: ids,
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "chunk_text": pc.binary_join(chunks, " "),
                "n_chunks": pa.array(n_chunks[doc_of_chunk], pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def chunk_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    num_buckets: int | None = None,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Cross-document chunk-level exact dedup: drop every repeated
    ``window``-token chunk corpus-wide (first occurrence by
    ``(id, chunk_idx)`` survives), then reassemble each document from its
    surviving chunks.

    Output: ``(id, text, n_chunks_total, n_chunks_kept)``; documents whose
    every chunk was removed disappear. Three keyed exchanges, all scale-safe:
    the keep-first groupby rides :func:`~odibel_ray.ops.relational.exact_dedup`
    (per-batch combiner first, so the shuffle moves one row per (batch,
    chunk)), and reassembly is one ``id``-hash shuffle whose kernel rebuilds
    texts from run-length offsets + one ``binary_join`` (zero per-doc Python,
    same shape as ``nested.nest_turns``).
    """
    from odibel_ray.cdc.lww import bucket_of_keys
    from odibel_ray.ops.relational import exact_dedup
    from odibel_ray.tuning import default_num_buckets

    num_buckets = default_num_buckets(num_buckets)
    chunks = split_chunks(
        ds, id_col=id_col, text_col=text_col, window=window, batch_size=batch_size
    )

    # first occurrence = lexicographic (id, chunk_idx) min — a multi-column
    # tie-break, NOT an id*2^32+idx packed key (which wraps int64 for
    # doc_id >= 2^31 and crashes on non-numeric ids)
    kept = exact_dedup(
        chunks,
        ["chunk_text"],
        tie_break=[id_col, "chunk_idx"],
        batch_size=batch_size,
    )

    def tag(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        b = bucket_of_keys(t, [id_col], num_buckets)
        return t.append_column("_cbucket", pa.array(b, pa.int64()))

    def reassemble(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[(id_col, "ascending"), ("chunk_idx", "ascending")]
            )
        )
        ids = g[id_col].to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        offsets = pa.array(np.append(bounds, len(g)).astype(np.int64), pa.int64())
        lists = pa.LargeListArray.from_arrays(
            offsets, g["chunk_text"].combine_chunks()
        )
        return pa.table(
            {
                id_col: g[id_col].take(pa.array(bounds)),
                text_col: pc.binary_join(lists, " "),
                "n_chunks_total": g["n_chunks"].take(pa.array(bounds)),
                "n_chunks_kept": pa.array(np.diff(np.append(bounds, len(g))), pa.int64()),
            }
        )

    return (
        kept.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
        .groupby("_cbucket")
        .map_groups(reassemble, batch_format="pyarrow")
    )


def decontaminate_bloom(
    train: "ray.data.Dataset",
    test: "ray.data.Dataset",
    *,
    n: int = 3,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """BFF-style Bloom decontamination (the Dolma/"Bloom Filter Filtering"
    scale path): the held-out split's word-``n``-gram hashes build ONE
    packed Bloom filter (streaming partials, bitwise-OR fold — no shuffle,
    no join), which broadcasts to a single scoring pass over the train
    corpus. Returns ``(id_col, n_grams, n_hits, hit_frac)`` per train doc.

    Contract: NO false negatives — every gram truly shared with the test
    split counts in ``n_hits`` (the Bloom property), so thresholding
    ``hit_frac`` can only over-remove; the false-positive inflation is
    ~(1 − e^{−k·N/m})^k, tuned by ``num_bits``. The exact-join complement
    is :func:`decontaminate`; this variant costs O(test) + one broadcast
    instead of a two-sided shuffle — right when the test split is large
    and the train corpus is 100 TB."""
    import ray

    from odibel_ray.ops.bloom import Bloom

    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    n_words = num_bits // 64

    def _partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        bloom = Bloom(np.zeros(n_words, dtype=np.uint64), num_hashes)
        h, _ = _shingle_hashes_flat(t[text_col], n)
        bloom.add(h)
        return pa.table(
            {"words": pa.FixedSizeListArray.from_arrays(
                pa.array(bloom.words, pa.uint64()), n_words
            )}
        )

    words = np.zeros(n_words, dtype=np.uint64)
    for part in test.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow", batch_size=batch_size
    ).iter_batches(batch_format="pyarrow"):
        flat = part["words"].combine_chunks()
        for row in range(len(flat)):
            words |= np.asarray(flat[row].values, dtype=np.uint64)
    ref = ray.put(Bloom(words, num_hashes))

    def score(t: pa.Table, b=ref) -> pa.Table:
        bloom = ray.get(b)
        t = t.combine_chunks()
        h, sh_offs = _shingle_hashes_flat(t[text_col], n)
        hits = bloom.contains(h).astype(np.int64)
        n_docs = len(t)
        g_lens = np.diff(sh_offs)  # already per-doc SHINGLE counts
        per_doc = np.add.reduceat(
            np.append(hits, 0), sh_offs[:-1]
        ) * (g_lens > 0)
        frac = np.divide(per_doc, g_lens, out=np.zeros(n_docs),
                         where=g_lens > 0)
        return pa.table(
            {id_col: t[id_col],
             "n_grams": pa.array(g_lens.astype(np.int64)),
             "n_hits": pa.array(per_doc.astype(np.int64)),
             "hit_frac": pa.array(np.round(frac, 6))}
        )

    return train.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=batch_size
    )
