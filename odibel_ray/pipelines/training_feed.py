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

import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def training_dataset(
    out_dir: str,
    *,
    min_tokens: int = 1,
    roles: tuple[str, ...] = ("user", "assistant", "system", "tool"),
) -> "ray.data.Dataset":
    """Published table → filtered (conv_id, turn_idx, role, text, tokens)."""
    from odibel_ray.cdc.sink import read_published
    from odibel_ray.text import add_token_count

    ds = read_published(out_dir).select_columns(["conv_id", "turn_idx", "role", "text"])

    def keep(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        m = pc.and_(
            pc.is_in(t["role"], value_set=pa.array(list(roles))),
            pc.is_valid(t["text"]),
        )
        return t.filter(pc.fill_null(m, False))

    return add_token_count(ds.map_batches(keep, batch_format="pyarrow"))


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
