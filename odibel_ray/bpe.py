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
    """Per-batch combiner: adjacent-pair counts weighted by word count."""
    counts = t["count"].to_numpy(zero_copy_only=False)
    pair_counts: dict[tuple[str, str], int] = {}
    for syms, c in zip(t["symbols"].to_pylist(), counts):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + int(c)
    if not pair_counts:
        return pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
             "count": pa.array([], pa.int64())}
        )
    a, b = zip(*pair_counts.keys())
    return pa.table(
        {"a": pa.array(a, pa.string()), "b": pa.array(b, pa.string()),
         "count": pa.array(list(pair_counts.values()), pa.int64())}
    )


def _train_distributed(
    hist: "ray.data.Dataset", num_merges: int, min_count: int
) -> list[tuple[str, str]]:
    """One distributed round per merge: pair partials → ``groupby(a,b).sum``
    → global top-1 (count desc, pair asc) → broadcast merge closure. The
    histogram is re-``materialize()``d each round so round N does not replay
    rounds 1..N-1's lineage (the histogram is Zipf-small; the corpus itself
    is never touched inside the loop)."""
    merges: list[tuple[str, str]] = []
    hist = hist.materialize()
    for _ in range(num_merges):
        agg = (
            hist.map_batches(_pair_partials, batch_format="pyarrow")
            .groupby(["a", "b"])
            .sum("count")
        )
        top = agg.sort(
            ["sum(count)", "a", "b"], descending=[True, False, False]
        ).limit(1).take_all()
        if not top or int(top[0]["sum(count)"]) < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        ab = a + b

        def apply(t: pa.Table, a=a, b=b, ab=ab) -> pa.Table:
            syms = [
                _merge_word(s, a, b, ab) if a in s else s
                for s in t["symbols"].to_pylist()
            ]
            return t.set_column(
                t.schema.get_field_index("symbols"),
                "symbols",
                pa.array(syms, pa.list_(pa.string())),
            )

        hist = hist.map_batches(apply, batch_format="pyarrow").materialize()
        merges.append((a, b))
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
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a text column.

    Stops early when the best remaining pair occurs fewer than ``min_count``
    times. ``driver_budget_rows`` picks the merge-loop strategy (see module
    docstring); both strategies return the identical merge sequence.
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
        hist.map_batches(to_symbols, batch_format="pyarrow"), num_merges, min_count
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
