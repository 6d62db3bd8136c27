"""Trainable fastText-style linear text classifier at corpus scale.

The standard quality / language / domain filter in large training-data
pipelines is a TRAINED linear model over hashed bag-of-n-gram features
(Joulin et al. 2016, "Bag of Tricks for Efficient Text Classification"),
not a fixed heuristic. This module trains exactly that — multinomial
logistic regression over hashed token (+ optional bigram) counts — with
full-batch gradient descent expressed Ray-Data-first:

- **Features** are hashed into ``dim`` buckets per doc (vectorized: one
  ``split_pattern`` + one hash pass per batch, segmented bincount — no
  per-doc Python), L1-normalized (fastText's mean-of-embeddings analog).
- **Each GD iteration is ONE streaming pass**: the current weight matrix
  (classes × dim, a few MB) is ``ray.put`` once and read by every task;
  each batch emits a DENSE partial gradient (classes × dim float64) plus
  its loss/count partials, summed on the driver. Nothing corpus-sized
  ever sits on the driver; cost per iteration is one map pass, no
  shuffle.
- **Determinism**: fixed zero init and a fixed step schedule. Partial
  summation order varies across runs (floating point is not
  associative), so training is reproducible to ~1e-9 — the pytest pins
  agreement with a single-process numpy reference to that tolerance and
  prediction equality exactly.

Inference (:func:`classify`) is a stateless ``map_batches`` against the
broadcast weights — the shape every scoring stage in this engine uses.

Scale posture: the 100-TB use is train-on-seed, score-the-corpus — the
labeled training set is curation-budget-sized (labels are the expensive
part; fastText quality filters are trained on 10⁴–10⁶ seed docs), so the
iters × seed-passes training cost is small, while the corpus only ever
pays the single stateless scoring pass. Full-batch GD is chosen over SGD
deliberately: it is deterministic and exactly pinned to a one-process
reference, and at seed scale its cost is irrelevant.

Reference analog: none (the reference has no trainable models); part of
the training-data suite mandated by the build brief. Not SQL-expressible
(training is iterative), so it is pinned by pytest rather than a DuckDB
oracle, like BPE training.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pyarrow as pa

from odibel_ray.dedup import _flat_token_hashes

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_BIGRAM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _doc_feature_matrix(
    texts, dim: int, *, bigrams: bool = False
) -> np.ndarray:
    """Dense (docs × dim) L1-normalized hashed-count features for a batch.
    Dense is right here: a batch of a few thousand docs × a 2^16-ish dim
    is a few hundred MB at most and the GD math is pure BLAS on it."""
    th, offs = _flat_token_hashes(texts)
    n = len(offs) - 1
    x = np.zeros((n, dim), np.float64)
    if len(th):
        doc_id = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        cols = (th % np.uint64(dim)).astype(np.int64)
        np.add.at(x, (doc_id, cols), 1.0)
        if bigrams:
            same = doc_id[:-1] == doc_id[1:]
            with np.errstate(over="ignore"):
                bg = (th[:-1] * _BIGRAM_MIX + th[1:])[same]
            bcols = (bg % np.uint64(dim)).astype(np.int64)
            np.add.at(x, (doc_id[:-1][same], bcols), 1.0)
    tot = x.sum(axis=1, keepdims=True)
    np.divide(x, tot, out=x, where=tot > 0)
    return x


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def grad_partial(
    x: np.ndarray, y: np.ndarray, w: np.ndarray
) -> tuple[np.ndarray, float, int]:
    """Unregularized gradient + loss contribution of one batch (the L2 term
    is added once driver-side — it must not be multiplied by batch count)."""
    p = _softmax(x @ w.T)
    n = len(x)
    onehot = np.zeros_like(p)
    onehot[np.arange(n), y] = 1.0
    g = (p - onehot).T @ x
    loss = -float(np.log(np.maximum(p[np.arange(n), y], 1e-300)).sum())
    return g, loss, n


def train_linear_classifier(
    ds: "ray.data.Dataset",
    *,
    label_col: str,
    text_col: str = "text",
    classes: Sequence[str] | None = None,
    dim: int = 1 << 16,
    bigrams: bool = False,
    lr: float = 0.5,
    iters: int = 30,
    l2: float = 1e-4,
    batch_size: int = 4096,
    stats: dict | None = None,
) -> dict:
    """Full-batch multinomial logistic regression over hashed n-gram
    features. Returns ``{"weights": (C × dim) ndarray, "classes": [...],
    "dim": dim, "bigrams": bool}`` — the model artifact `classify` takes
    (persist with ``numpy.save`` / the sink like any other sidecar).

    ``classes=None`` discovers the label set with one small distinct
    aggregate (labels are enum-sized). The input is materialized once and
    every iteration streams it against the broadcast weights."""
    import ray

    ds = ds.select_columns([label_col, text_col]).materialize()
    if classes is None:
        classes = sorted(
            r[label_col] for r in ds.groupby(label_col).count().take_all()
        )
    classes = list(classes)
    cindex = {c: i for i, c in enumerate(classes)}
    n_cls = len(classes)
    w = np.zeros((n_cls, dim), np.float64)

    def partials(t: pa.Table, *, wref) -> pa.Table:
        t = t.combine_chunks()
        wv = ray.get(wref)
        x = _doc_feature_matrix(t[text_col], dim, bigrams=bigrams)
        y = np.array(
            [cindex[v] for v in t[label_col].to_pylist()], np.int64
        )
        g, loss, n = grad_partial(x, y, wv)
        return pa.table(
            {
                "g": pa.array([g.tobytes()], pa.large_binary()),
                "loss": pa.array([loss], pa.float64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    from functools import partial as _partial

    history: list[float] = []
    n_total = 0
    for it in range(iters):
        wref = ray.put(w)
        g = np.zeros_like(w)
        loss = 0.0
        n_total = 0
        for part in ds.map_batches(
            _partial(partials, wref=wref),
            batch_format="pyarrow",
            batch_size=batch_size,
        ).iter_batches(batch_format="pyarrow"):
            for blob, ls, n in zip(
                part["g"].to_pylist(), part["loss"].to_pylist(),
                part["n"].to_pylist(),
            ):
                g += np.frombuffer(blob, np.float64).reshape(w.shape)
                loss += ls
                n_total += n
        if n_total == 0:
            break
        g = g / n_total + l2 * w
        loss = loss / n_total + 0.5 * l2 * float((w * w).sum())
        w = w - lr * g
        history.append(loss)
    if stats is not None:
        stats["loss_history"] = history
        stats["n_docs"] = n_total
    return {"weights": w, "classes": classes, "dim": dim, "bigrams": bigrams}


def classify(
    ds: "ray.data.Dataset",
    model: dict,
    *,
    text_col: str = "text",
    out_col: str = "pred",
    score_col: str = "pred_score",
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Score every doc under a trained model: appends the argmax class and
    its softmax probability. Stateless streaming pass against the
    broadcast weight matrix."""
    import ray

    wref = ray.put(
        (np.asarray(model["weights"]), list(model["classes"]),
         int(model["dim"]), bool(model["bigrams"]))
    )

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        w, classes, dim, bigrams = ray.get(wref)
        x = _doc_feature_matrix(t[text_col], dim, bigrams=bigrams)
        p = _softmax(x @ w.T)
        idx = p.argmax(axis=1)
        return t.append_column(
            out_col, pa.array([classes[i] for i in idx], pa.string())
        ).append_column(
            score_col, pa.array(p[np.arange(len(idx)), idx])
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
