"""Training-data consumer: stream the published transcript table as shuffled,
tokenet-budgeted batches — the downstream a 100 TB CDC lake exists for.

Shapes demonstrated:

- **windowed shuffle, not global**: ``local_shuffle_buffer_size`` on
  ``iter_batches`` (per-worker reservoir) instead of ``random_shuffle()``
  (an all-to-all over the entire table);
- **deterministic epoch order**: file/block order is fixed by the manifest
  read; the shuffle seed makes epochs reproducible;
- **filter-at-read**: quality/length predicates run as vectorized batch
  filters before batching, so rejected rows never reach the trainer.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

PAD_ID, SEP_ID = 0, 1


def training_dataset(
    out_dir: str,
    *,
    min_tokens: int = 1,
    roles: tuple[str, ...] = ("user", "assistant", "system", "tool"),
) -> "ray.data.Dataset":
    """Published table → filtered (conv_id, turn_idx, role, text, tokens)."""
    from odibel_ray.cdc.sink import read_published
    from odibel_ray.text import add_token_count

    # column pruning at the scan — score/ts never leave the Parquet files
    ds = read_published(out_dir, columns=["conv_id", "turn_idx", "role", "text"])

    def keep(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        m = pc.and_(
            pc.is_in(t["role"], value_set=pa.array(list(roles))),
            pc.is_valid(t["text"]),
        )
        return t.filter(pc.fill_null(m, False))

    return add_token_count(ds.map_batches(keep, batch_format="pyarrow"))


def pack_sequences(
    ds: "ray.data.Dataset",
    *,
    seq_len: int = 512,
    vocab_size: int = 32000,
    text_col: str = "text",
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    """Greedy sequence packing for a pretraining feed: texts are tokenized to
    deterministic hash vocab ids (a stand-in encode — swap the id derivation
    for a real BPE without touching the packing), concatenated with a ``SEP``
    between documents, and emitted as fixed ``seq_len`` windows
    (``input_ids`` fixed-size list + ``n_real`` non-pad count).

    Packing is per batch with no cross-batch state, so blocks stream with
    backpressure; only the final window of each batch carries padding, so
    waste is bounded by ``seq_len / tokens_per_batch``. Fully vectorized
    (one flat token-hash pass + one scatter per batch).
    """
    from odibel_ray.dedup import _flat_token_hashes

    def pack(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        th, offs = _flat_token_hashes(t[text_col])
        lens = np.diff(offs)
        ids = (th % np.uint64(vocab_size - 2) + np.uint64(2)).astype(np.int64)
        T, n = len(ids), len(lens)
        # interleave SEP after each doc: token j of doc i lands at j + i
        stream = np.full(T + n, SEP_ID, dtype=np.int64)
        if T:
            pos = np.arange(T) + np.repeat(np.arange(n), lens)
            stream[pos] = ids
        pad = (-len(stream)) % seq_len
        if pad:
            stream = np.concatenate([stream, np.full(pad, PAD_ID, np.int64)])
        mat = stream.reshape(-1, seq_len)
        n_real = (mat != PAD_ID).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "input_ids": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), pa.int64()), seq_len
                ),
                "n_real": pa.array(n_real),
            }
        )

    return ds.map_batches(pack, batch_format="pyarrow", batch_size=batch_size)


def iter_training_batches(
    out_dir: str,
    *,
    batch_size: int = 256,
    shuffle_buffer: int = 4096,
    seed: int = 0,
    min_tokens: int = 1,
) -> Iterator[pa.Table]:
    """Yield shuffled Arrow batches filtered to ``tokens >= min_tokens``."""
    ds = training_dataset(out_dir)
    ds = ds.filter(expr=f"tokens >= {int(min_tokens)}")
    yield from ds.iter_batches(
        batch_size=batch_size,
        batch_format="pyarrow",
        local_shuffle_buffer_size=shuffle_buffer,
        local_shuffle_seed=seed,
    )
