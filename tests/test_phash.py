"""Perceptual-hash image near-dup (multimodal.py): aHash + banded LSH."""

import numpy as np
import pyarrow as pa
import ray.data

from odibel_ray.multimodal import (
    MEDIA_SCHEMA,
    encode_png_media,
    image_near_dups,
    perceptual_hashes,
)


def _corpus():
    """20 distinct random images + 3 planted near-dups (brightness jitter)
    of image 0 + 1 exact re-encode of image 5."""
    rng = np.random.default_rng(17)
    rows = []
    arrs = {}
    for i in range(20):
        arr = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        # smooth so aHash bits are stable under jitter (random noise images
        # have near-threshold cells)
        arr = (arr.astype(np.int64) // 64 * 64).astype(np.uint8)
        arrs[i] = arr
        rows.append(encode_png_media(i, arr))
    for j, base in enumerate([0, 0, 0, 5]):
        arr = np.clip(arrs[base].astype(np.int64) + 3, 0, 255).astype(np.uint8)
        if base == 5:
            arr = arrs[5]
        rows.append(encode_png_media(100 + j, arr))
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def test_perceptual_hash_stability(ray_session):
    t = _corpus()
    h = (
        perceptual_hashes(ray.data.from_arrow(t), concurrency=2)
        .to_pandas().set_index("media_id")["phash"]
    )
    assert len(h) == 24  # every image row hashed
    assert h[103] == h[5]  # exact re-encode -> identical hash
    # jittered copies of 0 within a few bits
    for j in (100, 101, 102):
        d = bin((int(h[0]) ^ int(h[j])) & 0xFFFFFFFFFFFFFFFF).count("1")
        assert d <= 6, (j, d)


def test_image_near_dups_recovers_planted(ray_session):
    t = _corpus()
    pairs = image_near_dups(ray.data.from_arrow(t), max_hamming=6).to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs.id_a, pairs.id_b)}
    # planted: 0~100/101/102 (+ their mutual pairs), 5~103
    for want in [(0, 100), (0, 101), (0, 102), (5, 103)]:
        assert want in got, (want, got)
    # each emitted pair appears once (cross-band dedup)
    assert len(pairs) == len(got)
    assert (pairs.hamming <= 6).all()
