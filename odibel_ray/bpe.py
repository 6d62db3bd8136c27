"""Distributed BPE tokenizer training and encoding over a Ray Dataset.

A training-data pipeline at 100 TB needs a tokenizer trained *on* that
corpus. The classic byte-pair-encoding algorithm (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") splits in two
parts with very different scale profiles:

1. **Word histogram** — one pass over the whole corpus counting distinct
   pre-tokenized words. This is the O(corpus) stage and is fully
   distributed here: per-batch ``value_counts`` partials (combiner) feeding
   one ``groupby(word).sum`` exchange, exactly the pre-aggregation shape the
   engine uses everywhere else (``ops/aggregates.py``).
2. **Merge loop** — iterate "count adjacent symbol pairs weighted by word
   frequency, merge the most frequent pair" over the *histogram*, which by
   Zipf's law is tiny relative to the corpus (a few million distinct words
   for web-scale text). :func:`train_bpe` runs this loop driver-side when
   the histogram fits a row budget (the fast path, exact classic algorithm),
   and falls back to a fully distributed per-merge plan (pair-count partials
   → ``groupby(a,b).sum`` → global top-1 → broadcast merge via closure) when
   it does not. Both paths emit the **identical** merge sequence: ties are
   broken deterministically by (count desc, pair lexicographically asc).

Encoding applies the learned merge ranks greedily per word (lowest rank
first, all occurrences per step — the canonical BPE encoder), memoized per
distinct word in actor state, so the hot path is a dict hit per word, not a
merge loop per occurrence.

The reference engine has no tokenizer trainer; this is part of the
training-data suite mandated by the build brief (alongside dedup/quality/
lang-ID in ``text.py`` / ``dedup.py``). Training is not SQL-expressible, so
it is pinned by an exact pytest against an independent naive implementation
(``tests/test_bpe.py``) instead of a DuckDB oracle.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

#: End-of-word marker appended as a distinct final symbol to every word, so
#: merges learned at word boundaries ("ing</w>") differ from mid-word ones.
END_OF_WORD = "</w>"

#: Above this many distinct words the merge loop switches from the exact
#: driver-side implementation to the distributed per-merge plan. A histogram
#: row is a word + symbol list + count (~100 B); 2M rows ≈ a few hundred MB
#: of driver heap, far under the 8 GB the reference grants its driver
#: (``cli/rdf_cmd.py:167-173``).
DEFAULT_DRIVER_BUDGET_ROWS = 2_000_000


# ---------------------------------------------------------------------------
# stage 1 — word histogram (the distributed O(corpus) pass)
# ---------------------------------------------------------------------------


def word_histogram(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    *,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Distinct-word counts over a text column: whitespace pre-tokenization,
    per-batch ``value_counts`` combiner, one ``groupby(word).sum`` exchange.

    Returns a Dataset with columns ``word`` (string) and ``count`` (int64).
    """

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        words = pc.split_pattern_regex(t[text_col], pattern=r"\s+")
        flat = pc.list_flatten(words)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table(
            {"word": vc.field("values"), "count": vc.field("counts").cast(pa.int64())}
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("word")
        .sum("count")
    )
    return hist.map_batches(
        lambda t: t.rename_columns(["word", "count"]), batch_format="pyarrow"
    )


def _symbols_of(word: str) -> list[str]:
    return list(word) + [END_OF_WORD]


# ---------------------------------------------------------------------------
# merge primitives shared by both loop implementations
# ---------------------------------------------------------------------------


def _merge_word(syms: Sequence[str], a: str, b: str, ab: str) -> list[str]:
    """Replace every (left-to-right, non-overlapping) adjacent ``a, b`` in
    ``syms`` with the fused symbol ``ab``."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if syms[i] == a and i + 1 < n and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _best_pair(pair_counts: dict, min_count: int):
    """Deterministic argmax: highest count, ties to the lexicographically
    smallest pair. Returns None when the loop should stop."""
    if not pair_counts:
        return None
    top = max(pair_counts.values())
    if top < min_count:
        return None
    return min(p for p, c in pair_counts.items() if c == top)


# ---------------------------------------------------------------------------
# merge loop, driver-side exact path
# ---------------------------------------------------------------------------


def _train_driver(
    words: list[list[str]], counts: list[int], num_merges: int, min_count: int
) -> list[tuple[str, str]]:
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in zip(words, counts):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        best = _best_pair(pair_counts, min_count)
        if best is None:
            break
        a, b = best
        ab = a + b
        words = [
            _merge_word(s, a, b, ab) if a in s else s  # cheap prefilter
            for s in words
        ]
        merges.append(best)
    return merges


# ---------------------------------------------------------------------------
# merge loop, distributed path
# ---------------------------------------------------------------------------


def _pair_partials(t: pa.Table) -> pa.Table:
    """Per-batch combiner: adjacent-pair counts weighted by word count —
    vectorized over the flattened symbols column (no per-word Python)."""
    t = t.combine_chunks()
    weights = t["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat, _off, wid = _flat_symbols(t["symbols"])
    counts = _pair_scan_counts(flat, wid, weights)
    if counts.empty:
        return pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
             "count": pa.array([], pa.int64())}
        )
    return pa.table(
        {"a": pa.array(counts.index.get_level_values(0), pa.string()),
         "b": pa.array(counts.index.get_level_values(1), pa.string()),
         "count": pa.array(counts.to_numpy(), pa.int64())}
    )


def _flat_symbols(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """list<string> column → (flat values, offsets starting at 0, word ids)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    off = np.concatenate([[0], np.cumsum(lens)])
    word_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return col.flatten(), off, word_id


def _select_merge_sites(
    flat: pa.Array, word_id: np.ndarray, a: str, b: str
) -> np.ndarray:
    """Indices i of left-to-right non-overlapping adjacent (a, b) occurrences
    within one word — the vectorized twin of :func:`_merge_word`'s scan.
    Overlapping candidate runs (only possible when ``a == b``) keep every
    other site starting from the run head, matching the serial greedy."""
    n = len(flat)
    if n < 2:
        return np.empty(0, dtype=np.int64)
    eq_a = pc.equal(flat, a).to_numpy(zero_copy_only=False)
    eq_b = pc.equal(flat, b).to_numpy(zero_copy_only=False)
    cand = eq_a[:-1] & eq_b[1:] & (word_id[:-1] == word_id[1:])
    idx = np.flatnonzero(cand)
    if len(idx) == 0:
        return idx
    new_run = np.ones(len(idx), dtype=bool)
    new_run[1:] = np.diff(idx) != 1
    run_start = np.maximum.accumulate(
        np.where(new_run, np.arange(len(idx)), 0)
    )
    return idx[((np.arange(len(idx)) - run_start) % 2) == 0]


def _apply_merges_flat(
    flat: pa.Array, off: np.ndarray, word_id: np.ndarray, batch: list[tuple[str, str]]
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Apply ``batch`` sequentially to the flattened symbols — Arrow/numpy
    kernels only, no per-row Python merge loops."""
    for a, b in batch:
        sel = _select_merge_sites(flat, word_id, a, b)
        if len(sel) == 0:
            continue
        mask = np.zeros(len(flat), dtype=bool)
        mask[sel] = True
        flat = pc.if_else(pa.array(mask), pa.scalar(a + b), flat)
        keep = np.ones(len(flat), dtype=bool)
        keep[sel + 1] = False
        flat = flat.filter(pa.array(keep))
        lens = np.diff(off) - np.bincount(word_id[sel], minlength=len(off) - 1)
        off = np.concatenate([[0], np.cumsum(lens)])
        word_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return flat, off, word_id


def _rebuild_symbols(flat: pa.Array, off: np.ndarray) -> pa.ListArray:
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return pa.ListArray.from_arrays(pa.array(off, pa.int32()), flat)


def _pair_scan_counts(
    flat: pa.Array, word_id: np.ndarray, weights: np.ndarray
) -> pd.Series:
    """Scan-count of adjacent pairs weighted by word count (overlaps counted,
    exactly like :func:`_train_driver`'s per-iteration recount)."""
    empty = pd.Series(
        dtype=np.int64,
        index=pd.MultiIndex.from_arrays([[], []], names=["a", "b"]),
    )
    if len(flat) < 2:
        return empty
    vals = flat.to_numpy(zero_copy_only=False)
    m = word_id[:-1] == word_id[1:]
    if not m.any():
        return empty
    left, right = vals[:-1][m], vals[1:][m]
    w = weights[word_id[:-1][m]]
    df = pd.DataFrame({"a": left, "b": right, "w": w})
    return df.groupby(["a", "b"], sort=False)["w"].sum()


def _batch_delta_partials(
    t: pa.Table, batch: list[tuple[str, str]]
) -> pa.Table:
    """Per-batch combiner for the delta pass: simulate ``batch`` in order and
    emit, per merge step, the EXACT pair-count delta of the words this batch
    holds — (m_idx, a, b, delta) rows. Affected words only: a word without a
    merge site contributes zero delta at that step and is skipped via the
    restriction to words containing selected sites."""
    t = t.combine_chunks()
    weights = t["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat, off, word_id = _flat_symbols(t["symbols"])
    out_m, out_a, out_b, out_d = [], [], [], []
    for m_idx, (a, b) in enumerate(batch):
        sel = _select_merge_sites(flat, word_id, a, b)
        if len(sel) == 0:
            continue
        touched = np.unique(word_id[sel])
        in_touched = np.zeros(len(off) - 1, dtype=bool)
        in_touched[touched] = True
        pre_mask = in_touched[word_id]
        pre_flat = flat.filter(pa.array(pre_mask))
        # word ids re-labelled 0..len(touched)-1 for the touched subset
        relabel = np.cumsum(in_touched) - 1
        pre_wid = relabel[word_id[pre_mask]]
        pre_counts = _pair_scan_counts(pre_flat, pre_wid, weights[touched])
        flat, off, word_id = _apply_merges_flat(flat, off, word_id, [(a, b)])
        post_mask = in_touched[word_id]
        post_flat = flat.filter(pa.array(post_mask))
        post_wid = relabel[word_id[post_mask]]
        post_counts = _pair_scan_counts(post_flat, post_wid, weights[touched])
        delta = post_counts.sub(pre_counts, fill_value=0).astype(np.int64)
        delta = delta[delta != 0]
        for (pa_, pb_), d in delta.items():
            out_m.append(m_idx)
            out_a.append(pa_)
            out_b.append(pb_)
            out_d.append(int(d))
    return pa.table(
        {
            "m_idx": pa.array(out_m, pa.int64()),
            "a": pa.array(out_a, pa.string()),
            "b": pa.array(out_b, pa.string()),
            "delta": pa.array(out_d, pa.int64()),
        }
    )


def _speculate_batch(
    counts: dict[tuple[str, str], int],
    sample: tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray],
    min_count: int,
    k: int,
) -> list[tuple[str, str]]:
    """Predict the next ``k`` serial merges by simulating the merge loop on
    the driver-held Zipf-head SAMPLE of the histogram, anchored to the EXACT
    pair counts: step 1 is the exact argmax (always serial-correct); each
    later step ranks ``exact counts + accumulated sample deltas``, so
    chained merges (fuse "th", then "th"+"e" — the dominant pattern in real
    text, where the fused pair immediately outranks everything) are
    predicted instead of forcing one histogram round each. Serial-sequence
    equality is enforced afterwards by full-corpus exact-delta validation;
    this is a speculation heuristic, not a correctness condition. When the
    sample IS the whole histogram, prediction is exact and validation never
    truncates."""
    flat, off, wid, weights = sample
    pred = dict(counts)
    batch: list[tuple[str, str]] = []
    pre = _pair_scan_counts(flat, wid, weights)
    for _ in range(k):
        best = _best_of_counts(pred, min_count)
        if best is None:
            break
        batch.append(best)
        if len(batch) >= k:
            break
        flat, off, wid = _apply_merges_flat(flat, off, wid, [best])
        post = _pair_scan_counts(flat, wid, weights)
        delta = post.sub(pre, fill_value=0).astype(np.int64)
        pre = post
        for p, d in delta[delta != 0].items():
            nc = pred.get(p, 0) + int(d)
            if nc:
                pred[p] = nc
            else:
                pred.pop(p, None)
    return batch


def _best_of_counts(counts: dict[tuple[str, str], int], min_count: int):
    best = None
    for p, c in counts.items():
        if c < min_count:
            continue
        if best is None or (-c, p) < best:
            best = (-c, p)
    return None if best is None else best[1]


def _train_distributed(
    hist: "ray.data.Dataset",
    num_merges: int,
    min_count: int,
    *,
    batch_merges: int = 16,
    sample_rows: int = 100_000,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Distributed merge loop with driver-held EXACT pair counts and
    speculative merge batching — identical merge sequence to
    :func:`_train_driver`, verified per batch.

    Scale shape: the word histogram stays distributed (that is what blew the
    driver budget), but the PAIR-COUNT table is alphabet²-plus-merges
    bounded (a few 100k entries for 1000 merges over UTF-8 text) and lives
    on the driver, so no per-merge ``groupby(a,b).sum`` + global sort
    exchange exists at all. Each round: (1) speculate the next k merges by
    simulating the serial loop on a driver-held Zipf-head sample (top
    ``sample_rows`` words by count — stable across rounds since merges
    never change word counts) anchored to the exact pair counts, (2) ONE
    vectorized map pass simulates the batch over the full histogram and
    emits per-step exact pair-count deltas (affected-words scan diff), (3)
    the driver replays the deltas to verify each batch step is exactly the
    serial argmax — speculation is discarded from the first step where the
    prediction diverges, (4) ONE vectorized map pass applies the validated
    prefix and re-materializes. 1000 merges cost ~2·⌈1000/k⌉ histogram
    passes and zero per-merge all-to-all exchanges, vs 1000 × (pass +
    groupby + sort) before; every kernel is Arrow/numpy over the flattened
    symbols column (no ``to_pylist`` row loops)."""
    from functools import partial as _partial

    merges: list[tuple[str, str]] = []
    hist = hist.materialize()

    # speculation sample: the Zipf head by word count (one sort exchange,
    # once — word counts never change, only their symbol splits, which the
    # driver mirrors by applying each accepted merge to the sample too)
    s_tbl = pa.Table.from_pylist(
        hist.sort("count", descending=True).limit(sample_rows).take_all()
    )
    s_weights = s_tbl["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    s_flat, s_off, s_wid = _flat_symbols(s_tbl["symbols"])

    # exact initial pair counts: per-batch combiner partials summed driver-side
    counts: dict[tuple[str, str], int] = {}
    for part in hist.map_batches(
        _pair_partials, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for a, b, c in zip(
            part["a"].to_pylist(), part["b"].to_pylist(), part["count"].to_pylist()
        ):
            counts[(a, b)] = counts.get((a, b), 0) + int(c)

    rounds = 0
    while len(merges) < num_merges:
        k = num_merges - len(merges)
        if batch_merges > 0:
            k = min(k, batch_merges)
        batch = _speculate_batch(
            counts, (s_flat, s_off, s_wid, s_weights), min_count, k
        )
        if not batch:
            break
        rounds += 1

        # delta pass: exact per-step pair-count deltas, no histogram write
        deltas: dict[int, dict[tuple[str, str], int]] = {}
        for part in hist.map_batches(
            _partial(_batch_delta_partials, batch=batch), batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for m, a, b, d in zip(
                part["m_idx"].to_pylist(),
                part["a"].to_pylist(),
                part["b"].to_pylist(),
                part["delta"].to_pylist(),
            ):
                step = deltas.setdefault(int(m), {})
                step[(a, b)] = step.get((a, b), 0) + int(d)

        # validate: each step must be the serial argmax given the prior steps
        accepted = 0
        done = False
        for i, pair in enumerate(batch):
            best = _best_of_counts(counts, min_count)
            if best is None:
                done = True
                break
            if best != pair:
                break  # speculation diverged; re-batch from exact counts
            for p, d in deltas.get(i, {}).items():
                nc = counts.get(p, 0) + d
                if nc:
                    counts[p] = nc
                else:
                    counts.pop(p, None)
            merges.append(pair)
            accepted += 1
        if accepted:
            applied = batch[:accepted]
            s_flat, s_off, s_wid = _apply_merges_flat(
                s_flat, s_off, s_wid, applied
            )

            def apply(t: pa.Table, applied=applied) -> pa.Table:
                t = t.combine_chunks()
                flat, off, word_id = _flat_symbols(t["symbols"])
                flat, off, _ = _apply_merges_flat(flat, off, word_id, applied)
                return t.set_column(
                    t.schema.get_field_index("symbols"),
                    "symbols",
                    _rebuild_symbols(flat, off),
                )

            hist = hist.map_batches(apply, batch_format="pyarrow").materialize()
        if done:
            break
        if not accepted:
            # first batch element is always the exact argmax — reaching here
            # means counts say stop (min_count) on re-check
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["merges"] = len(merges)
    return merges


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def train_bpe(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    *,
    num_merges: int = 1000,
    min_count: int = 2,
    driver_budget_rows: int = DEFAULT_DRIVER_BUDGET_ROWS,
    batch_size: int = 65536,
    batch_merges: int = 16,
    sample_rows: int = 100_000,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a text column.

    Stops early when the best remaining pair occurs fewer than ``min_count``
    times. ``driver_budget_rows`` picks the merge-loop strategy (see module
    docstring); both strategies return the identical merge sequence.
    ``batch_merges`` bounds the distributed path's speculative batch size
    (1 = one histogram round per merge; higher amortizes rounds).
    """
    hist = word_histogram(ds, text_col, batch_size=batch_size).materialize()
    if hist.count() <= driver_budget_rows:
        rows = hist.take_all()
        words = [_symbols_of(r["word"]) for r in rows]
        counts = [int(r["count"]) for r in rows]
        return _train_driver(words, counts, num_merges, min_count)

    def to_symbols(t: pa.Table) -> pa.Table:
        syms = [_symbols_of(w) for w in t["word"].to_pylist()]
        return t.append_column("symbols", pa.array(syms, pa.list_(pa.string())))

    return _train_distributed(
        hist.map_batches(to_symbols, batch_format="pyarrow"),
        num_merges,
        min_count,
        batch_merges=batch_merges,
        sample_rows=sample_rows,
        stats=stats,
    )


def merges_table(merges: Iterable[tuple[str, str]]) -> pa.Table:
    """Merge list → Arrow table ``(rank, a, b)`` for persisting with the
    sink (the trained-tokenizer artifact of a curation run)."""
    merges = list(merges)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "a": pa.array([a for a, _ in merges], pa.string()),
            "b": pa.array([b for _, b in merges], pa.string()),
        }
    )


def merges_from_table(t: pa.Table) -> list[tuple[str, str]]:
    t = t.sort_by("rank")
    return list(zip(t["a"].to_pylist(), t["b"].to_pylist()))


class BpeEncoder:
    """Actor-pool stage: encode a text column with a trained merge list.

    Merge ranks and the per-distinct-word memo cache are built once per
    actor (T4 stateful-stage shape, ``SURVEY.md §2.3``); ``__call__`` is a
    dict lookup per word for everything previously seen in that actor.
    Appends ``out`` (list<string> BPE tokens) and ``out + '_n'`` (int64).
    """

    def __init__(self, merges: Sequence[tuple[str, str]], text_col: str = "text",
                 out: str = "bpe_tokens"):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col = text_col
        self.out = out
        self.cache: dict[str, list[str]] = {}

    def _encode_word(self, word: str) -> list[str]:
        hit = self.cache.get(word)
        if hit is not None:
            return hit
        syms = _symbols_of(word)
        while len(syms) > 1:
            ranked = [
                (self.ranks.get((syms[i], syms[i + 1])), i)
                for i in range(len(syms) - 1)
            ]
            ranked = [(r, i) for r, i in ranked if r is not None]
            if not ranked:
                break
            _, idx = min(ranked)
            a, b = syms[idx], syms[idx + 1]
            syms = _merge_word(syms, a, b, a + b)
        self.cache[word] = syms
        return syms

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        words = pc.split_pattern_regex(t[self.text_col], pattern=r"\s+")
        toks: list[list[str]] = []
        for row in words.to_pylist():
            enc: list[str] = []
            for w in row or []:
                if w:
                    enc.extend(self._encode_word(w))
            toks.append(enc)
        arr = pa.array(toks, pa.list_(pa.string()))
        return t.append_column(self.out, arr).append_column(
            self.out + "_n", pc.list_value_length(arr).cast(pa.int64())
        )


def encode_bpe(
    ds: "ray.data.Dataset",
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    *,
    out: str = "bpe_tokens",
    concurrency: int | None = None,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Apply a trained merge list to a text column via an encoder actor pool."""
    from odibel_ray.tuning import default_pool_size

    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges": list(merges), "text_col": text_col, "out": out},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool_size(concurrency),
    )


def decode_tokens(tokens: Iterable[str]) -> str:
    """Inverse of encoding: concatenate symbols, turning each
    :data:`END_OF_WORD` back into a single space (trailing space stripped)."""
    return "".join(tokens).replace(END_OF_WORD, " ").rstrip(" ")
