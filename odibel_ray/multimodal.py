"""Multimodal column plumbing: opaque binary media payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

Codecs, dispatched per payload by :class:`DispatchCodec` (the default in
every stage, constructed once per actor):

- ``ODB1`` fake container (header ``ODB1 | kind | w | h | c | sample_rate``
  + raw buffer) → :class:`FakeCodec` — the deterministic synthetic path;
- real **PNG** → :class:`PILCodec` when Pillow is importable, else the
  dependency-free stdlib :func:`png_decode`/:func:`png_encode` (zlib), so
  the real-format path is exercised even in this no-codec-libs sandbox;
- other real formats (JPEG, audio, video containers) raise a clearly-marked
  ``NotImplementedError`` naming the missing dependency (PIL/ffmpeg).

Everything around the codec is real and tested: the Arrow ``binary`` column
schema, small-batch sizing for large payloads, per-actor decoder state, and
the feature/resize/frame-sample output layouts.
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + typ
        + body
        + zlib.crc32(typ + body).to_bytes(4, "big")
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Minimal stdlib PNG encoder (8-bit gray/GA/RGB/RGBA, filter 0,
    non-interlaced) — real-format output without any codec dependency."""
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(payload) -> np.ndarray:
    """Minimal stdlib PNG decoder: 8-bit gray/GA/RGB/RGBA, non-interlaced,
    all five scanline filters. Filter 0/2 rows are vectorized; 1/3/4 fall
    back to per-pixel loops (sufficient for test images — a production
    deployment swaps in :class:`PILCodec`)."""
    import zlib

    data = bytes(payload)
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, idat = 8, []
    w = h = color_type = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or interlace != 0:
                raise NotImplementedError("only 8-bit non-interlaced PNG")
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if f == 1:  # sub
            for x in range(channels, stride):
                row[x] = (row[x] + row[x - channels]) & 0xFF
        elif f == 2:  # up
            row = (row + prev) & 0xFF
        elif f == 3:  # average
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # paeth
            for x in range(stride):
                a = row[x - channels] if x >= channels else 0
                b = prev[x]
                cc = prev[x - channels] if x >= channels else 0
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
                row[x] = (row[x] + pred) & 0xFF
        out[y] = row.astype(np.uint8)
        prev = row
    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


class PILCodec:
    """Real-codec adapter (optional dependency): decodes any PIL-supported
    format, encodes PNG. Import is deferred so the class can exist — and the
    dispatch below can *prefer* it — in environments without Pillow."""

    def __init__(self):
        from PIL import Image  # raises ImportError when Pillow is absent

        self._Image = Image

    def decode(self, payload) -> np.ndarray:
        import io

        return np.asarray(self._Image.open(io.BytesIO(bytes(payload))))

    def encode(self, arr: np.ndarray) -> bytes:
        import io

        buf = io.BytesIO()
        self._Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()


class DispatchCodec:
    """Format-dispatching codec: ODB1 fake container → :class:`FakeCodec`;
    PNG signature → :class:`PILCodec` when Pillow is importable, else the
    stdlib :func:`png_decode`; anything else raises ``NotImplementedError``
    naming the missing dependency. This is the default codec of every
    actor-pool media stage, so real PNG payloads flow through the same
    plumbing as the synthetic container — constructed once per actor."""

    def __init__(self):
        self._fake = FakeCodec()
        try:
            self._pil: PILCodec | None = PILCodec()
        except ImportError:
            self._pil = None

    def detect(self, payload) -> str:
        mv = memoryview(payload)
        if bytes(mv[:4]) == _MAGIC:
            return "odb1"
        if bytes(mv[:8]) == _PNG_SIG:
            return "png"
        return "unknown"

    def decode(self, payload) -> np.ndarray:
        fmt = self.detect(payload)
        if fmt == "odb1":
            return self._fake.decode(payload)
        if fmt == "png":
            return self._pil.decode(payload) if self._pil else png_decode(payload)
        raise NotImplementedError(
            "unrecognized media container: real formats beyond PNG need "
            "PIL/ffmpeg (not available in this environment)"
        )

    def encode_image(self, arr: np.ndarray, fmt: str) -> bytes:
        if fmt == "png":
            if self._pil:
                return self._pil.encode(arr)
            return png_encode(arr)
        h, w = arr.shape[:2]
        c = arr.shape[2] if arr.ndim == 3 else 1
        header = _MAGIC + struct.pack("<4siiii", b"imag", w, h, c, 0)
        return header + np.ascontiguousarray(arr).tobytes()


def encode_png_media(media_id: int, arr: np.ndarray) -> dict:
    """A MEDIA_SCHEMA row holding a real PNG payload."""
    h, w = arr.shape[:2]
    c = arr.shape[2] if arr.ndim == 3 else 1
    return {
        "media_id": media_id,
        "kind": "image",
        "payload": png_encode(arr),
        "width": int(w),
        "height": int(h),
        "channels": int(c),
        "sample_rate": 0,
    }


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
        self.codec = DispatchCodec()

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
        self.codec = DispatchCodec()
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
            fmt = self.codec.detect(mv)
            img = self.codec.decode(mv)
            h, w = img.shape[:2]
            yi = (np.arange(th) * h // th)[:, None]
            xi = (np.arange(tw) * w // tw)[None, :]
            resized = np.ascontiguousarray(img[yi, xi])
            # re-encode in the payload's own container (PNG stays PNG)
            payloads[i] = self.codec.encode_image(resized, fmt)
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
        self.codec = DispatchCodec()
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


def _avg_pool(a: np.ndarray, k: int) -> np.ndarray:
    """Area-average downsample of a 2-D array to k×k (arbitrary input size,
    vectorized block means via ``reduceat``)."""
    if a.shape[0] < k or a.shape[1] < k:  # tiny image: upsample by repeat
        a = np.repeat(np.repeat(a, (k // a.shape[0]) + 1, axis=0),
                      (k // a.shape[1]) + 1, axis=1)
    rb = (np.arange(k + 1) * a.shape[0]) // k
    cb = (np.arange(k + 1) * a.shape[1]) // k
    s = np.add.reduceat(np.add.reduceat(a.astype(np.float64), rb[:-1], axis=0),
                        cb[:-1], axis=1)
    return s / np.outer(np.diff(rb), np.diff(cb))


class PerceptualHasher:
    """Actor-pool stage: image payload → 64-bit average hash (aHash).

    Decode (codec built once per actor) → grayscale (channel mean) → 8×8
    area-average pool → threshold at the pooled mean → packed uint64. Near-
    duplicate images (re-encodes, small edits, brightness jitter) land within
    a few Hamming bits; the per-payload loop is inherent to decoding (same
    trade as :class:`MediaFeatures` — batches stay small, state per actor).
    Emits ``(media_id, phash)`` for image rows only.
    """

    def __init__(self, hash_size: int = 8):
        self.codec = DispatchCodec()
        self.k = hash_size

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        kinds = t["kind"].to_pylist()
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        out_ids, out_hash = [], []
        for view, kind, mid in zip(_payload_views(t), kinds, ids):
            if kind != "image":
                continue
            arr = self.codec.decode(view)
            gray = arr.astype(np.float64).mean(axis=2) if arr.ndim == 3 else arr
            pooled = _avg_pool(gray, self.k)
            bits = (pooled > pooled.mean()).ravel()
            h = np.uint64(0)
            for b in np.packbits(bits.astype(np.uint8)):
                h = (h << np.uint64(8)) | np.uint64(b)
            out_ids.append(int(mid))
            out_hash.append(int(h.view(np.int64)))
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "phash": pa.array(out_hash, pa.int64()),
        })


def perceptual_hashes(ds: "ray.data.Dataset", *, hash_size: int = 8,
                      concurrency: int | None = None, batch_size: int = 64):
    """(media_id, phash) over the image rows — actor-pool aHash stage."""
    from odibel_ray.tuning import default_pool_size

    return ds.map_batches(
        PerceptualHasher, fn_constructor_kwargs={"hash_size": hash_size},
        concurrency=default_pool_size(concurrency), batch_size=batch_size,
        batch_format="pyarrow",
    )


def image_near_dups(
    ds: "ray.data.Dataset",
    *,
    max_hamming: int = 6,
    hash_size: int = 8,
    num_bands: int = 8,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Near-duplicate image pairs by banded perceptual-hash LSH: each 64-bit
    aHash splits into ``num_bands`` equal bands (SimHash banding guarantee:
    any pair with < num_bands differing bits collides on ≥1 band, so full
    recall requires ``max_hamming < num_bands`` — hence the defaults 6 < 8);
    in-bucket verification is one vectorized XOR-popcount. Emits
    ``(id_a, id_b, hamming)`` pairs, cross-band duplicates collapsed by the
    pair-keyed groupby.
    """
    from ray.data.aggregate import Min

    if max_hamming >= num_bands:
        raise ValueError(
            f"max_hamming={max_hamming} >= num_bands={num_bands}: pairs whose "
            "differing bits cover every band would be silently missed; raise "
            "num_bands (full recall needs max_hamming < num_bands)"
        )

    hashed = perceptual_hashes(ds, hash_size=hash_size,
                               concurrency=concurrency, batch_size=batch_size)
    width = 64 // num_bands

    def _bands(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        h = t["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(h)
        band = np.tile(np.arange(num_bands, dtype=np.int64), n)
        hh = np.repeat(h, num_bands)
        shift = (band * width).astype(np.uint64)
        val = (hh >> shift) & np.uint64((1 << width) - 1)
        return pa.table({
            "band": pa.array(band, pa.int64()),
            "band_val": pa.array(val.view(np.int64), pa.int64()),
            "media_id": t["media_id"].take(
                pa.array(np.repeat(np.arange(n, dtype=np.int64), num_bands))
            ),
            "phash": t["phash"].take(
                pa.array(np.repeat(np.arange(n, dtype=np.int64), num_bands))
            ),
        })

    def _verify(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        n = len(g)
        empty = pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        })
        if n < 2:
            return empty
        order = np.argsort(g["media_id"].to_numpy(zero_copy_only=False),
                           kind="stable")
        g = g.take(pa.array(order))
        ids = g["media_id"].to_numpy(zero_copy_only=False)
        h = g["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ia, ib = np.triu_indices(n, k=1)
        x = h[ia] ^ h[ib]
        # vectorized popcount over uint64 via the uint8 view
        d = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        keep = d <= max_hamming
        return pa.table({
            "id_a": pa.array(ids[ia[keep]], pa.int64()),
            "id_b": pa.array(ids[ib[keep]], pa.int64()),
            "hamming": pa.array(d[keep].astype(np.int64), pa.int64()),
        })

    pairs = (
        hashed.map_batches(_bands, batch_format="pyarrow")
        .groupby(["band", "band_val"])
        .map_groups(_verify, batch_format="pyarrow")
    )
    # collapse cross-band duplicates of the same pair
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def sample_frames(ds: "ray.data.Dataset", stride: int = 4, *,
                  concurrency: int | None = None, batch_size: int = 64):
    from odibel_ray.tuning import default_pool_size

    return ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": stride},
        concurrency=default_pool_size(concurrency), batch_size=batch_size,
        batch_format="pyarrow",
    )


def media_features(ds: "ray.data.Dataset", *, concurrency: int | None = None,
                   batch_size: int = 64):
    from odibel_ray.tuning import default_pool_size

    return ds.map_batches(
        MediaFeatures, concurrency=default_pool_size(concurrency),
        batch_size=batch_size, batch_format="pyarrow",
    )


def resize_images(ds: "ray.data.Dataset", target=(16, 16), *,
                  concurrency: int | None = None, batch_size: int = 64):
    from odibel_ray.tuning import default_pool_size

    return ds.map_batches(
        ImageResizer, fn_constructor_kwargs={"target": target},
        concurrency=default_pool_size(concurrency), batch_size=batch_size,
        batch_format="pyarrow",
    )
