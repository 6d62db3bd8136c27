"""Trainable hashed-n-gram linear classifier vs a single-process reference."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _separable_corpus(n_per_class: int = 120, overlap: float = 0.3):
    """Deterministic 3-class corpus: each class draws 70% from its own
    vocabulary and 30% from a shared one (the synthetic documents table's
    ``lang`` column is NOT text-correlated, so a learnable fixture is
    synthesized here — same approach as the language-ID accuracy test)."""
    rng = np.random.default_rng(23)
    vocabs = {
        "news": [f"news{i}" for i in range(60)],
        "code": [f"code{i}" for i in range(60)],
        "chat": [f"chat{i}" for i in range(60)],
    }
    shared = [f"common{i}" for i in range(40)]
    ids, texts, labels = [], [], []
    k = 0
    for label, vocab in vocabs.items():
        for _ in range(n_per_class):
            n_tok = int(rng.integers(20, 60))
            toks = [
                (shared[int(rng.integers(len(shared)))]
                 if rng.random() < overlap
                 else vocab[int(rng.integers(len(vocab)))])
                for _ in range(n_tok)
            ]
            ids.append(k)
            texts.append(" ".join(toks))
            labels.append(label)
            k += 1
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "label": pa.array(labels, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _local_reference(texts, labels, classes, dim, lr, iters, l2):
    """Same math, one process, one batch — the distributed trainer must
    agree to float-summation tolerance."""
    from odibel_ray.classifier import _doc_feature_matrix, _softmax

    x = _doc_feature_matrix(pa.array(texts, pa.string()), dim)
    cindex = {c: i for i, c in enumerate(classes)}
    y = np.array([cindex[v] for v in labels], np.int64)
    w = np.zeros((len(classes), dim), np.float64)
    for _ in range(iters):
        p = _softmax(x @ w.T)
        onehot = np.zeros_like(p)
        onehot[np.arange(len(y)), y] = 1.0
        g = (p - onehot).T @ x / len(y) + l2 * w
        w = w - lr * g
    return w, x, y


def test_distributed_training_matches_local_reference(ray_session):
    import ray.data as rd

    from odibel_ray.classifier import classify, train_linear_classifier

    t = _separable_corpus()
    texts = t["text"].to_pylist()
    labels = t["label"].to_pylist()
    classes = sorted(set(labels))
    dim, lr, iters, l2 = 1 << 12, 2.0, 25, 1e-4

    stats: dict = {}
    model = train_linear_classifier(
        rd.from_arrow(t),
        label_col="label",
        classes=classes,
        dim=dim,
        lr=lr,
        iters=iters,
        l2=l2,
        batch_size=64,  # force many partials — the summation under test
        stats=stats,
    )
    w_ref, x, y = _local_reference(texts, labels, classes, dim, lr, iters, l2)
    assert np.allclose(model["weights"], w_ref, atol=1e-9)
    assert stats["n_docs"] == len(texts)
    # loss decreases monotonically at this lr on this corpus
    assert stats["loss_history"][-1] < stats["loss_history"][0]

    # prediction equality with the reference + real training-accuracy signal
    scored = classify(rd.from_arrow(t), model).take_all()
    by_id = {r["doc_id"]: r for r in scored}
    from odibel_ray.classifier import _softmax

    p_ref = _softmax(x @ w_ref.T)
    ref_pred = [classes[i] for i in p_ref.argmax(axis=1)]
    ids = t["doc_id"].to_pylist()
    assert [by_id[i]["pred"] for i in ids] == ref_pred
    acc = np.mean([by_id[i]["pred"] == l for i, l in zip(ids, labels)])
    assert acc > 0.95  # disjoint class vocabularies are linearly separable


def test_classifier_generalizes_to_held_out(ray_session):
    """Train on 2/3 of the corpus, score the held-out third — the filter
    use case: a model trained on labeled seed data scores the corpus."""
    import ray.data as rd

    from odibel_ray.classifier import classify, train_linear_classifier

    t = _separable_corpus()
    ids = np.array(t["doc_id"].to_pylist())
    train_mask = ids % 3 != 0
    train = t.filter(pa.array(train_mask))
    held = t.filter(pa.array(~train_mask))
    model = train_linear_classifier(
        rd.from_arrow(train), label_col="label", dim=1 << 12, lr=2.0,
        iters=25,
    )
    out = classify(rd.from_arrow(held), model).take_all()
    acc = np.mean(
        [r["pred"] == l for r, l in zip(
            sorted(out, key=lambda r: r["doc_id"]),
            held["label"].to_pylist(),
        )]
    )
    assert acc > 0.9


def test_classes_discovered_and_bigrams_run(ray_session):
    import ray.data as rd

    from odibel_ray.classifier import classify, train_linear_classifier

    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"])
    model = train_linear_classifier(
        rd.from_arrow(t), label_col="lang", dim=1 << 10, iters=3,
        bigrams=True,
    )
    assert model["classes"] == sorted(set(t["lang"].to_pylist()))
    out = classify(rd.from_arrow(t).limit(20), model).take_all()
    assert len(out) == 20
    assert all(0.0 < r["pred_score"] <= 1.0 for r in out)
    assert all(r["pred"] in model["classes"] for r in out)
