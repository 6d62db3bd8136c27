"""Text-analysis stages for large-scale training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

All stages are vectorized ``map_batches`` transforms over the ``documents``
table (``doc_id, text, lang, source, n_chars``). The reference has per-record
text parsing (wikitext template extraction, ``utils/WikiTextParser.scala:12-62``)
run inside worker-held state (SURVEY.md §2.2 M11); here the per-worker state
(compiled patterns, language profiles) lives in a callable-class ``__init__``
(actor-pool pattern) where it is non-trivial, and in module constants where it
is cheap.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

# ---------------------------------------------------------------------------
# token counting — whitespace tokens, SQL-oracle-matchable
# ---------------------------------------------------------------------------


def add_token_count(
    ds: "ray.data.Dataset", text_col: str = "text", out: str = "tokens", batch_size: int = 65536
):
    """Whitespace token count per row: ``#spaces + 1`` on single-space-joined
    text (matches SQL ``length(t) - length(replace(t,' ','')) + 1``)."""

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        total = pc.utf8_length(t[text_col])
        nospace = pc.utf8_length(pc.replace_substring(t[text_col], pattern=" ", replacement=""))
        tokens = pc.add(pc.subtract(total, nospace), 1)
        return t.append_column(out, pc.cast(tokens, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


#: BPE-ish token classes: letter runs | digit runs | single non-space symbol —
#: the pre-tokenization split most BPE vocabularies apply before merges
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def add_regex_token_count(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    out: str = "regex_tokens",
    *,
    pattern: str = BPE_TOKEN_PATTERN,
    batch_size: int = 65536,
):
    """BPE-ish regex token count per row — one vectorized
    ``pc.count_substring_regex`` kernel per batch (SQL twin:
    ``len(regexp_extract_all(text, pattern))``)."""

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = pc.count_substring_regex(t[text_col], pattern=pattern)
        return t.append_column(out, pc.cast(n, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = (
    "the a an and or of to in is are was for on with as at by it this that".split()
)


class QualityScorer:
    """Actor-pool stage: per-doc quality features (length, mean word length,
    stopword ratio, alpha ratio). State (stopword set as an Arrow value set for
    ``pc.is_in``) is built once per actor in ``__init__``."""

    def __init__(self, stopwords=None):
        self.stop_set = pa.array(stopwords or _STOPWORDS, pa.string())

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        words = pc.split_pattern(t[text_col := "text"], pattern=" ")
        n_words = pc.list_value_length(words).cast(pa.int64())
        flat = pc.list_flatten(words)
        is_stop = pc.is_in(flat, value_set=self.stop_set).to_numpy(zero_copy_only=False)
        # per-row stopword counts via segmented sum over list offsets
        offsets = np.asarray(words.combine_chunks().offsets)
        stops = np.add.reduceat(
            np.append(is_stop.astype(np.int64), 0), offsets[:-1]
        ) * (np.diff(offsets) > 0)
        nchars = pc.utf8_length(t[text_col]).cast(pa.float64())
        nw = n_words.to_numpy(zero_copy_only=False).astype(np.float64)
        stop_ratio = np.round(np.divide(stops, nw, out=np.zeros_like(nw), where=nw > 0), 6)
        mean_wlen = np.round(
            np.divide(
                nchars.to_numpy(zero_copy_only=False) - (nw - 1),
                nw,
                out=np.zeros_like(nw),
                where=nw > 0,
            ),
            6,
        )
        return t.select(["doc_id"]).append_column(
            "tokens", n_words
        ).append_column("stop_ratio", pa.array(stop_ratio)).append_column(
            "mean_word_len", pa.array(mean_wlen)
        )


def quality_scores(ds: "ray.data.Dataset", *, concurrency: int | None = None,
                   batch_size: int = 8192):
    """Quality features via an actor pool (stateful-stage shape, SURVEY.md §2.3 T4)."""
    from odibel_ray.tuning import default_pool_size

    return ds.map_batches(
        QualityScorer, concurrency=default_pool_size(concurrency),
        batch_size=batch_size, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# language ID — character-frequency heuristic
# ---------------------------------------------------------------------------


def _utf8_flat(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat utf-8 byte array, per-doc byte lengths) zero-copy from the Arrow
    string buffers — the flattened-array basis for vectorized byte kernels."""
    arr = pc.coalesce(texts, pa.scalar(""))
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    otype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=otype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.array([], np.uint8)
    )
    flat = buf[offs[0] : offs[-1]]
    return flat, np.diff(offs)


class LanguageID:
    """N-gram-free language heuristic: cosine similarity of a doc's character
    histogram against per-language profiles learned from a labeled sample.
    Profiles are built once per actor (``__init__``), classification is one
    numpy matmul per batch."""

    def __init__(self, profiles: dict[str, np.ndarray] | None = None):
        if profiles is None:
            profiles = _DEFAULT_PROFILES
        self.langs = sorted(profiles)
        mat = np.stack([profiles[l] for l in self.langs]).astype(np.float64)
        self.mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)

    @staticmethod
    def char_histogram(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
        """(n_docs, 256) byte histogram — one ``np.bincount`` over the
        flattened byte stream keyed by ``doc_idx*256 + byte`` (no per-doc
        loop)."""
        flat, lens = _utf8_flat(texts)
        n = len(lens)
        if len(flat) == 0:
            return np.zeros((n, 256), dtype=np.float64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        hist = np.bincount(doc_idx * 256 + flat.astype(np.int64), minlength=n * 256)
        return hist.reshape(n, 256).astype(np.float64)

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        h = self.char_histogram(t["text"])
        h /= np.maximum(np.linalg.norm(h, axis=1, keepdims=True), 1e-12)
        sims = h @ self.mat.T
        pred = np.asarray(self.langs, dtype=object)[sims.argmax(axis=1)]
        return t.select(["doc_id"]).append_column("pred_lang", pa.array(pred, pa.string()))


def _profile_from(texts: list[str]) -> np.ndarray:
    h = np.zeros(256, dtype=np.float64)
    for s in texts:
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        h += np.bincount(b, minlength=256)
    return h


def fit_language_profiles(sample: pa.Table, lang_col: str = "lang") -> dict[str, np.ndarray]:
    """Learn per-language byte histograms from a labeled sample (driver-side,
    sample is small; broadcast into the LanguageID actor pool)."""
    profiles: dict[str, np.ndarray] = {}
    langs = sample[lang_col].to_pylist()
    texts = sample["text"].to_pylist()
    for lang in set(langs):
        profiles[lang] = _profile_from([t for t, l in zip(texts, langs) if l == lang])
    return profiles


_DEFAULT_PROFILES: dict[str, np.ndarray] = {}


def language_id(ds: "ray.data.Dataset", profiles, *, concurrency: int | None = None,
                batch_size: int = 8192):
    from odibel_ray.tuning import default_pool_size

    return ds.map_batches(
        LanguageID,
        fn_constructor_kwargs={"profiles": profiles},
        concurrency=default_pool_size(concurrency),
        batch_size=batch_size,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# template / tool-call extraction (M11 analog)
# ---------------------------------------------------------------------------


class TemplateExtractor:
    """Actor-pool stage: extract ``{{name|arg|...}}`` template usages from a
    text column (the reference's wikitext template parser,
    ``utils/WikiTextParser.scala:12-62``, re-read as tool-call extraction from
    transcript turns). The regex is compiled once per actor; nested braces are
    handled by a brace-depth scan only on rows that contain ``{{`` at all
    (cheap vectorized prefilter)."""

    def __init__(self, prefix: str = ""):
        import re

        self.prefix = prefix
        self.open_pat = re.compile(r"\{\{")

    def _extract(self, s: str) -> list[str]:
        out = []
        i = 0
        n = len(s)
        while True:
            start = s.find("{{", i)
            if start < 0:
                break
            depth = 0
            j = start
            while j < n - 1:
                if s[j] == "{" and s[j + 1] == "{":
                    depth += 1
                    j += 2
                elif s[j] == "}" and s[j + 1] == "}":
                    depth -= 1
                    j += 2
                    if depth == 0:
                        break
                else:
                    j += 1
            if depth != 0:
                break
            body = s[start + 2 : j - 2]
            if body.startswith(self.prefix):
                out.append(body)
            i = j
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        has = pc.match_substring(t["text"], "{{").to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        ids, names, bodies = [], [], []
        key = t.column_names[0]
        keys = t[key].to_pylist()
        for k, s, h in zip(keys, texts, has):
            if not h or not s:
                continue
            for body in self._extract(s):
                ids.append(k)
                names.append(body.split("|", 1)[0].strip())
                bodies.append(body)
        return pa.table(
            {
                key: pa.array(ids),
                "template_name": pa.array(names, pa.string()),
                "template_body": pa.array(bodies, pa.string()),
            }
        )


def extract_templates(ds: "ray.data.Dataset", prefix: str = "", *,
                      concurrency: int | None = None, batch_size: int = 8192):
    """1 row → k template rows (``flat_map`` shape) via an actor pool."""
    from odibel_ray.tuning import default_pool_size

    return ds.map_batches(
        TemplateExtractor, fn_constructor_kwargs={"prefix": prefix},
        concurrency=default_pool_size(concurrency), batch_size=batch_size,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# document fingerprinting — 64-bit content hash (rolling polynomial)
# ---------------------------------------------------------------------------


def add_fingerprint(ds: "ray.data.Dataset", text_col: str = "text", out: str = "fp"):
    """Deterministic 64-bit content fingerprint per doc (change-detection
    short-circuit analog of the reference's MD5 template hashing,
    ``utils/WikiUtil.scala:13-30``). Polynomial rolling hash over utf-8 bytes,
    vectorized per batch."""

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        flat, lens = _utf8_flat(t[text_col])
        n_docs = len(lens)
        P = np.uint64(1099511628211)
        F = np.uint64(14695981039346656037)
        # fp(doc) = F·P^len + Σ byte_i · P^(len-1-i)  — computed for the whole
        # batch at once: one shared power table, per-byte exponents from the
        # doc-relative position, segmented sums via np.add.reduceat
        maxlen = int(lens.max()) if n_docs else 0
        pows = np.concatenate(
            ([np.uint64(1)], np.multiply.accumulate(np.full(maxlen, P, np.uint64)))
        )
        fps = F * pows[lens]
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
            pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], lens)
            exp = np.repeat(lens, lens) - 1 - pos
            term = flat.astype(np.uint64) * pows[exp]
            sums = np.add.reduceat(term, offs[nonempty])
            fps[nonempty] = fps[nonempty] + sums
        return t.append_column(out, pa.array(fps.astype(np.int64), pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# chunking + redaction (training-data preparation over the documents table)
# ---------------------------------------------------------------------------


def chunk_documents(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    size: int,
    overlap: int = 0,
    out: str = "chunk",
    idx_col: str = "chunk_idx",
    batch_size: int = 8192,
):
    """Split each document into sliding windows of ``size`` characters with
    ``overlap`` (LLM-context chunking). ``n_chunks = 1`` when the text fits,
    else ``ceil((len - size) / stride) + 1`` with ``stride = size -
    overlap`` — the last chunk may be shorter, nothing is dropped.

    Vectorized without per-row Python: chunk index ``i`` shares one scalar
    ``[i*stride, i*stride + size)`` window across ALL documents, so the
    batch loops over chunk indices (bounded by the longest doc), not rows —
    each iteration is one ``utf8_slice_codeunits`` kernel over the rows
    still long enough. 1→k rows; every other column is carried through.
    SQL twin: ``substring(text, i*stride + 1, size)`` against a
    ``generate_series`` lateral join."""
    if overlap >= size:
        raise ValueError("overlap must be smaller than size")
    stride = size - overlap

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        lens = pc.utf8_length(t[text_col]).to_numpy(zero_copy_only=False)
        n_chunks = np.where(
            lens <= size, 1, np.ceil((lens - size) / stride).astype(np.int64) + 1
        )
        parts = []
        max_chunks = int(n_chunks.max()) if len(t) else 0
        for i in range(max_chunks):
            live = n_chunks > i
            sub = t.filter(pa.array(live))
            piece = pc.utf8_slice_codeunits(
                sub[text_col], start=i * stride, stop=i * stride + size
            )
            part = sub.append_column(idx_col, pa.array(np.full(len(sub), i, np.int64)))
            parts.append(part.append_column(out, piece))
        if not parts:
            empty = t.append_column(idx_col, pa.nulls(0, pa.int64()))
            return empty.append_column(out, pa.nulls(0, pa.string()))
        return pa.concat_tables(parts)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def redact(
    ds: "ray.data.Dataset",
    *,
    pattern: str,
    replacement: str = "[REDACTED]",
    text_col: str = "text",
    out: str = "redacted",
    count_col: str | None = "n_redactions",
    batch_size: int = 65536,
):
    """Regex redaction (PII scrubbing shape): replace every match of
    ``pattern`` with ``replacement`` and, optionally, count the matches per
    row — one vectorized ``replace_substring_regex`` /
    ``count_substring_regex`` pair per batch. SQL twin:
    ``regexp_replace(text, pattern, replacement, 'g')``."""

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        red = pc.replace_substring_regex(
            t[text_col], pattern=pattern, replacement=replacement
        )
        t = t.append_column(out, red)
        if count_col:
            n = pc.count_substring_regex(t[text_col], pattern=pattern)
            t = t.append_column(count_col, pc.cast(n, pa.int64()))
        return t

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def normalize_text(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    out: str = "norm",
    batch_size: int = 65536,
):
    """Canonical text normalization for dedup/training prep: lowercase,
    collapse whitespace runs to one space, trim — three vectorized kernels
    per batch. SQL twin: ``trim(regexp_replace(lower(text), '\\s+', ' ',
    'g'))``."""

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = pc.utf8_lower(t[text_col])
        n = pc.replace_substring_regex(n, pattern=r"\s+", replacement=" ")
        n = pc.utf8_trim_whitespace(n)
        return t.append_column(out, n)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def repetition_stats(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple = (1, 2, 3),
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Within-document repetition metrics — the Gopher/MassiveText quality
    rules (Rae et al. 2021, §A1.1: "fraction of duplicate n-grams") that
    LLM pipelines threshold on to drop degenerate/boilerplate documents.

    For each ``n`` in ``ns`` the doc gets ``dup_{n}gram_frac`` =
    ``1 − distinct n-grams / total n-grams`` (0 for docs shorter than n).
    Fully vectorized over the flattened token-hash stream (one
    ``split_pattern`` + one hash per batch, per-segment distinct via one
    lexsort) — no per-row Python. Same rolling-hash n-gram identity as the
    MinHash/decontamination path."""
    from odibel_ray.dedup import _seg_unique, _shingle_hashes_flat

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        cols = {id_col: t[id_col]}
        for n in ns:
            flat, offs = _shingle_hashes_flat(t[text_col], n)
            total = np.diff(offs)
            idx = np.repeat(np.arange(len(t), dtype=np.int64), total)
            u_idx, _ = _seg_unique(idx, flat)
            distinct = np.bincount(u_idx, minlength=len(t))
            frac = 1.0 - distinct / np.maximum(total, 1)
            cols[f"dup_{n}gram_frac"] = pa.array(np.round(frac, 6))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def add_compression_ratio(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    out: str = "compression_ratio",
    level: int = 6,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Per-doc zlib compression ratio (compressed/raw bytes, rounded to 6;
    1.0 for empty docs) — the Dolma/Gopher-style repetitiveness signal:
    highly compressible text is boilerplate or degenerate repetition, and
    unlike gram-rate features it catches long-range structure. Per-row
    codec work in a streaming map pass (no state, no shuffle). Not
    SQL-expressible (no zlib in SQL), so it is pytest-pinned like the
    other codec stages."""
    import zlib

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ratios = []
        for s in t[text_col].to_pylist():
            b = (s or "").encode()
            ratios.append(
                round(len(zlib.compress(b, level)) / len(b), 6) if b else 1.0
            )
        return t.append_column(out, pa.array(ratios, pa.float64()))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
