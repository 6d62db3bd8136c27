"""Multimodal plumbing (fake codec) + salted skew-handling equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import collect_sorted

KEYS = ["conv_id", "turn_idx"]


def test_media_features_deterministic(ray_session):
    import ray.data as rd

    from odibel_ray.multimodal import generate_media_table, media_features

    tbl = generate_media_table(n=60)
    a = {r["media_id"]: (r["mean"], r["std"], r["n_samples"])
         for r in media_features(rd.from_arrow(tbl)).take_all()}
    b = {r["media_id"]: (r["mean"], r["std"], r["n_samples"])
         for r in media_features(rd.from_arrow(tbl)).take_all()}
    assert a == b and len(a) == 60
    kinds = {r["media_id"]: r["kind"] for r in tbl.to_pylist()}
    for mid, (_, _, n) in a.items():
        assert n > 0, (mid, kinds[mid])


def test_image_resize_roundtrip(ray_session):
    import ray.data as rd

    from odibel_ray.multimodal import (
        FakeCodec,
        generate_media_table,
        resize_images,
    )

    tbl = generate_media_table(n=30)
    out = resize_images(rd.from_arrow(tbl), target=(8, 8)).take_all()
    codec = FakeCodec()
    for r in out:
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (8, 8)
            img = codec.decode(r["payload"])
            assert img.shape == (8, 8, 3)


def test_video_frame_sampling(ray_session):
    import ray.data as rd

    from odibel_ray.multimodal import FakeCodec, generate_media_table, sample_frames

    tbl = generate_media_table(n=40)
    before = {r["media_id"]: r for r in tbl.to_pylist()}
    out = sample_frames(rd.from_arrow(tbl), stride=4).take_all()
    codec = FakeCodec()
    n_video = 0
    for r in out:
        if r["kind"] != "video":
            assert r["payload"] == before[r["media_id"]]["payload"]  # pass-through
            continue
        n_video += 1
        orig_frames = before[r["media_id"]]["sample_rate"]
        vid = codec.decode(r["payload"])
        expect = (orig_frames + 3) // 4  # every 4th frame
        assert vid.shape[0] == expect == r["sample_rate"]
        # sampled frame 1 == original frame at stride
        orig = codec.decode(before[r["media_id"]]["payload"])
        assert np.array_equal(vid[1], orig[4])
    assert n_video > 0


def test_codec_rejects_real_formats():
    from odibel_ray.multimodal import FakeCodec

    with pytest.raises(NotImplementedError):
        FakeCodec().decode(b"\x89PNG\r\n\x1a\n....")


def test_salted_replay_equivalence(ray_session, small_log, oracle_final):
    from odibel_ray.cdc.apply import replay_dataset

    salted = collect_sorted(
        replay_dataset(small_log["log_dir"], num_buckets=16, salt=4), KEYS
    )
    assert salted.equals(oracle_final)


def test_salted_lww_equivalence(ray_session):
    from odibel_ray.cdc.lww import lww_latest
    from odibel_ray.pipelines.queries import _events_as_changes

    sf = "/root/testdata/sf0.001"
    import pandas as pd

    def canon(ds):
        df = ds.to_pandas()
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), ignore_index=True)

    a = canon(lww_latest(_events_as_changes(sf), ["user_id", "event_type"], lsn_col="event_id"))
    b = canon(
        lww_latest(
            _events_as_changes(sf), ["user_id", "event_type"], lsn_col="event_id", salt=5
        )
    )
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# real-codec path (PNG via stdlib; PIL adapter when available)
# ---------------------------------------------------------------------------


def _forward_filter(img: "np.ndarray", ftype: int) -> bytes:
    """Reference forward PNG filtering (spec 4.5.2) for decoder tests."""
    import numpy as np

    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, np.int32)
    out = bytearray()
    for y in range(h):
        row = flat[y]
        filt = np.empty(stride, np.int32)
        for x in range(stride):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
            filt[x] = (row[x] - pred) & 0xFF
        out.append(ftype)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = row
    return bytes(out)


def test_png_roundtrip_and_filters():
    import struct
    import zlib

    import numpy as np

    from odibel_ray.multimodal import _PNG_SIG, _png_chunk, png_decode, png_encode

    rng = np.random.default_rng(9)
    for shape in ((13, 7, 3), (5, 9, 4), (8, 8)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (png_decode(png_encode(img)) == img).all()

    # decoder handles every scanline filter type (encoder only emits 0)
    img = rng.integers(0, 256, size=(11, 6, 3), dtype=np.uint8)
    for ftype in range(5):
        ihdr = struct.pack(">IIBBBBB", 6, 11, 8, 2, 0, 0, 0)
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(_forward_filter(img, ftype)))
            + _png_chunk(b"IEND", b"")
        )
        assert (png_decode(payload) == img).all(), f"filter {ftype}"


def test_real_png_through_media_stages(ray_session):
    """A real PNG payload flows through the same actor-pool stages as the
    synthetic container: features computed, resize re-encodes as PNG."""
    import numpy as np
    import ray.data as rd

    from odibel_ray.multimodal import (
        DispatchCodec,
        MEDIA_SCHEMA,
        encode_fake_media,
        encode_png_media,
        media_features,
        png_decode,
        resize_images,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    rows = [
        encode_png_media(0, img),
        encode_fake_media(1, "image", rng),
        encode_fake_media(2, "audio", rng),
    ]
    t = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    feats = media_features(rd.from_arrow(t)).to_pandas().set_index("media_id")
    assert feats.loc[0, "n_samples"] == img.size
    assert abs(feats.loc[0, "mean"] - img.mean()) < 1e-4

    out = resize_images(rd.from_arrow(t), target=(8, 6)).to_pandas()
    row = out[out.media_id == 0].iloc[0]
    assert (row.width, row.height) == (8, 6)
    assert DispatchCodec().detect(row.payload) == "png"  # container preserved
    resized = png_decode(row.payload)
    yi = (np.arange(6) * 24 // 6)[:, None]
    xi = (np.arange(8) * 32 // 8)[None, :]
    assert (resized == img[yi, xi]).all()
    # the fake-container image stays ODB1
    row1 = out[out.media_id == 1].iloc[0]
    assert DispatchCodec().detect(row1.payload) == "odb1"


def test_pil_adapter_cross_check():
    """When Pillow is installed the dispatch prefers it and its decode must
    agree with the stdlib decoder; skipped in dependency-free CI."""
    import numpy as np
    import pytest

    pytest.importorskip("PIL")
    from odibel_ray.multimodal import DispatchCodec, PILCodec, png_decode, png_encode

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    payload = png_encode(img)
    assert (PILCodec().decode(payload) == img).all()
    d = DispatchCodec()
    assert d._pil is not None
    assert (d.decode(payload) == png_decode(payload)).all()
