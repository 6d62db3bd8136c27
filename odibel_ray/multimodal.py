"""Multimodal column plumbing: opaque binary media payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

The image/audio codec libraries are not available in this environment, so the
*codec* is a deterministic fake — a self-describing header
(``ODB1 | kind | width | height | channels | sample_rate``) followed by a raw
uint8 buffer — decoded with numpy. Everything around the codec is real and
tested: the Arrow ``binary`` column schema, small-batch sizing for large
payloads, per-actor decoder state, and the feature/resize/frame-sample output
layouts. Swapping ``FakeCodec`` for PIL/ffmpeg is a one-class change
(clearly-marked ``NotImplementedError`` on real formats).
"""

from __future__ import annotations

import struct
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)

_MAGIC = b"ODB1"


def encode_fake_media(media_id: int, kind: str, rng: np.random.Generator) -> dict:
    """One deterministic fake media row (image: H·W·C uint8; audio: 1-D int16;
    video: F·H·W·C uint8 with the frame count carried in ``sample_rate``)."""
    if kind == "image":
        w, h, c = int(rng.integers(8, 64)), int(rng.integers(8, 64)), 3
        sr = 0
        body = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
    elif kind == "video":
        w, h, c = int(rng.integers(8, 24)), int(rng.integers(8, 24)), 3
        sr = int(rng.integers(8, 40))  # frame count
        body = rng.integers(0, 256, size=sr * h * w * c, dtype=np.uint8).tobytes()
    else:
        w = h = c = 0
        sr = 16000
        n = int(rng.integers(400, 4000))
        body = rng.integers(-(2**15), 2**15, size=n, dtype=np.int16).tobytes()
    header = _MAGIC + struct.pack("<4siiii", kind.encode()[:4].ljust(4), w, h, c, sr)
    return {
        "media_id": media_id,
        "kind": kind,
        "payload": header + body,
        "width": w,
        "height": h,
        "channels": c,
        "sample_rate": sr,
    }


def generate_media_table(n: int = 200, seed: int = 23) -> pa.Table:
    rng = np.random.default_rng(seed)
    kinds = {0: "audio", 1: "video"}
    rows = [
        encode_fake_media(i, kinds.get(i % 5, "image"), rng) for i in range(n)
    ]
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class FakeCodec:
    """Deterministic stand-in for an image/audio codec. ``decode`` accepts any
    buffer-like payload (bytes or a zero-copy memoryview into the Arrow data
    buffer)."""

    HEADER_LEN = 4 + 4 + 16

    def decode(self, payload) -> np.ndarray:
        mv = memoryview(payload)
        if bytes(mv[:4]) != _MAGIC:
            raise NotImplementedError(
                "real media formats need PIL/ffmpeg (not available in this "
                "environment); only the ODB1 fake container is decodable"
            )
        kind, w, h, c, sr = struct.unpack("<4siiii", mv[4 : self.HEADER_LEN])
        body = mv[self.HEADER_LEN :]
        k = kind.rstrip(b"\x00")
        if k == b"imag":
            return np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)
        if k == b"vide":
            return np.frombuffer(body, dtype=np.uint8).reshape(sr, h, w, c)
        return np.frombuffer(body, dtype=np.int16)


def _payload_views(t: pa.Table, col: str = "payload") -> list[memoryview]:
    """Zero-copy per-row memoryviews into the binary column's data buffer —
    no Python ``bytes`` copies, no ``to_pylist`` dict rows."""
    ba = t[col]
    if isinstance(ba, pa.ChunkedArray):
        ba = ba.combine_chunks() if ba.num_chunks != 1 else ba.chunk(0)
    bufs = ba.buffers()
    otype = np.int64 if pa.types.is_large_binary(ba.type) else np.int32
    offs = np.frombuffer(bufs[1], otype)[ba.offset : ba.offset + len(ba) + 1]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return [data[offs[i] : offs[i + 1]] for i in range(len(ba))]


class MediaFeatures:
    """Actor-pool stage: decode → per-channel stats features. Codec state is
    constructed once per actor (``__init__``); batches are small because
    payloads are large — size ``batch_size`` so batch × concurrency fits the
    worker heap (SURVEY.md 'memory-aware')."""

    def __init__(self):
        self.codec = FakeCodec()

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        views = _payload_views(t)
        n = len(t)
        means = np.empty(n)
        stds = np.empty(n)
        sizes = np.empty(n, dtype=np.int64)
        for i, mv in enumerate(views):  # per-item decode is intrinsic to a codec
            arr = self.codec.decode(mv)
            means[i] = round(float(arr.mean()), 6)
            stds[i] = round(float(arr.std()), 6)
            sizes[i] = arr.size
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "mean": pa.array(means),
                "std": pa.array(stds),
                "n_samples": pa.array(sizes),
            }
        )


class ImageResizer:
    """Actor-pool stage: decode → nearest-neighbor resize → re-encode to the
    fake container. Audio rows pass through unchanged."""

    def __init__(self, target: tuple[int, int] = (16, 16)):
        self.codec = FakeCodec()
        self.target = target

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        tw, th = self.target
        views = _payload_views(t)
        kinds = t["kind"].to_pylist()
        payloads: list = [None] * len(t)
        widths = t["width"].to_numpy(zero_copy_only=False).copy()
        heights = t["height"].to_numpy(zero_copy_only=False).copy()
        for i, mv in enumerate(views):
            if kinds[i] != "image":
                payloads[i] = bytes(mv)
                continue
            img = self.codec.decode(mv)
            h, w, c = img.shape
            yi = (np.arange(th) * h // th)[:, None]
            xi = (np.arange(tw) * w // tw)[None, :]
            resized = img[yi, xi]
            header = _MAGIC + struct.pack("<4siiii", b"imag", tw, th, c, 0)
            payloads[i] = header + resized.tobytes()
            widths[i], heights[i] = tw, th
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "channels": t["channels"],
                "sample_rate": t["sample_rate"],
            }
        )


class FrameSampler:
    """Actor-pool stage: keep every ``stride``-th frame of video payloads
    (re-encoded with the reduced frame count); images/audio pass through.
    The frame-sample step of a video-pretraining feed."""

    def __init__(self, stride: int = 4):
        self.codec = FakeCodec()
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        views = _payload_views(t)
        kinds = t["kind"].to_pylist()
        payloads: list = [None] * len(t)
        rates = t["sample_rate"].to_numpy(zero_copy_only=False).copy()
        for i, mv in enumerate(views):
            if kinds[i] != "video":
                payloads[i] = bytes(mv)
                continue
            vid = self.codec.decode(mv)  # (frames, h, w, c)
            sampled = np.ascontiguousarray(vid[:: self.stride])
            f, h, w, c = sampled.shape
            header = _MAGIC + struct.pack("<4siiii", b"vide", w, h, c, f)
            payloads[i] = header + sampled.tobytes()
            rates[i] = f
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "payload": pa.array(payloads, pa.binary()),
                "width": t["width"],
                "height": t["height"],
                "channels": t["channels"],
                "sample_rate": pa.array(rates, pa.int32()),
            }
        )


def sample_frames(ds: "ray.data.Dataset", stride: int = 4, *, concurrency: int = 2,
                  batch_size: int = 64):
    return ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": stride},
        concurrency=concurrency, batch_size=batch_size, batch_format="pyarrow",
    )


def media_features(ds: "ray.data.Dataset", *, concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        MediaFeatures, concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow",
    )


def resize_images(ds: "ray.data.Dataset", target=(16, 16), *, concurrency: int = 2,
                  batch_size: int = 64):
    return ds.map_batches(
        ImageResizer, fn_constructor_kwargs={"target": target},
        concurrency=concurrency, batch_size=batch_size, batch_format="pyarrow",
    )
