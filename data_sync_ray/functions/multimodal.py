"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `payload: binary` columns with metadata
(`media_type`, `width/height` or `sample_rate`, ...). Decode / resize /
feature-extract / frame-sample run as actor-pool map_batches stages: a
heavy library (PIL/ffmpeg/torchaudio) would load once per actor in
__init__.

Codec reality in this container: no PIL/cv2/libsndfile exists, so
COMPRESSED formats (png/jpeg/mp3/...) stay behind an honest
NotImplementedError. UNCOMPRESSED formats need no codec library, so
those decode for REAL: binary PPM/PGM (P6/P5) and 24-bit BI_RGB BMP in
pure numpy, and PCM WAV via the stdlib `wave` module — end-to-end
payload-bytes -> pixel/sample arrays -> features, with round-trip
encoders for test fixtures. `fake=True` keeps the deterministic
digest-seeded decoder for plumbing tests that don't care about pixels.

Batch-size note for 100 TB: binary payloads make rows wide; keep
`batch_size` small (<=256 here) and `target_max_block_size` at default so
a batch x concurrency fits worker heaps; blocks spill to the object store
rather than ballooning Python memory.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # image/png, audio/wav, ...
        ("payload", pa.binary()),
        ("meta_json", pa.string()),
    ]
)


def gen_fake_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    ids = [f"m{i:06d}" for i in range(n)]
    types = rng.choice(np.array(["image/png", "audio/wav"]), size=n)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    metas = ['{"w": 32, "h": 32}'] * n
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(types),
            "payload": pa.array(payloads, pa.binary()),
            "meta_json": pa.array(metas),
        },
        schema=MEDIA_SCHEMA,
    )


# --- real codecs for uncompressed formats (no library needed) ---------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6); (H, W) -> PGM (P5)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    magic = b"P6" if img.ndim == 3 else b"P5"
    h, w = img.shape[:2]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) -> uint8 pixel array, pure numpy.
    Handles whitespace/comments in the header per the netpbm spec."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = toks
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    return arr.reshape((h, w, 3) if ch == 3 else (h, w)).copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BI_RGB BMP
    (bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    row = w * 3
    pad = (-row) % 4
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        raster += img[y, :, ::-1].tobytes() + b"\x00" * pad
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + bytes(raster)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BI_RGB BMP -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit BI_RGB BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) int16 PCM -> WAV bytes via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.ascontiguousarray(samples, np.int16).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_frames, channels) int16 samples, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        raw = f.readframes(f.getnframes())
        arr = np.frombuffer(raw, dtype=np.int16).reshape(
            -1, f.getnchannels()
        )
        return arr.copy(), f.getframerate()


def _mean_pool_1d(v: np.ndarray, dim: int) -> np.ndarray:
    """Average v into `dim` contiguous buckets (vectorized bincount)."""
    v = np.asarray(v, dtype=np.float64).ravel()
    if v.size == 0:
        return np.zeros(dim, dtype=np.float32)
    idx = (np.arange(v.size) * dim) // v.size
    sums = np.bincount(idx, weights=v, minlength=dim)
    cnts = np.bincount(idx, minlength=dim)
    return (sums / np.maximum(cnts, 1)).astype(np.float32)


#: media types the real (codec-free) image path can decode
REAL_IMAGE_TYPES = {
    "image/x-portable-pixmap": decode_ppm,
    "image/x-portable-graymap": decode_ppm,
    "image/bmp": decode_bmp,
}


class DecodeImage:
    """Actor stage: payload bytes -> fixed-size float feature vector.

    fake=False is REAL for uncompressed payloads (PPM/PGM/BMP — see
    REAL_IMAGE_TYPES): decode to pixels, grayscale, mean-pool to
    feature_dim, scale to [0, 1]. Compressed types (png/jpeg) raise
    NotImplementedError at call time — the codec libraries are absent
    from this container. fake=True keeps the digest-seeded deterministic
    stub for plumbing tests.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = False):
        self.feature_dim = feature_dim
        self.fake = fake

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-features: digest-seeded uniform vector
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        return rng.random(self.feature_dim, dtype=np.float32)

    def _decode_real(self, payload: bytes, media_type: str) -> np.ndarray:
        dec = REAL_IMAGE_TYPES.get(media_type)
        if dec is None:
            raise NotImplementedError(
                f"no codec for {media_type!r} in this environment; "
                f"real decode supports {sorted(REAL_IMAGE_TYPES)} — "
                "use fake=True for the deterministic stub"
            )
        img = dec(payload).astype(np.float64)
        gray = img.mean(axis=2) if img.ndim == 3 else img
        return _mean_pool_1d(gray / 255.0, self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fake:
            feats = [
                self._decode_fake(p.as_py())
                for p in batch.column("payload")
            ]
        else:
            feats = [
                self._decode_real(p.as_py(), mt.as_py())
                for p, mt in zip(
                    batch.column("payload"), batch.column("media_type")
                )
            ]
        arr = pa.array(
            [f.tolist() for f in feats], pa.list_(pa.float32(), self.feature_dim)
        )
        return batch.drop_columns(["payload"]).append_column("features", arr)


class DecodeAudio:
    """Actor stage: PCM WAV payload -> windowed RMS feature vector plus
    sample_rate / n_samples columns. Real decode via the stdlib wave
    module (no codec library involved); non-WAV types raise."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, rates, counts = [], [], []
        for p, mt in zip(
            batch.column("payload"), batch.column("media_type")
        ):
            if mt.as_py() != "audio/wav":
                raise NotImplementedError(
                    f"no codec for {mt.as_py()!r}; only PCM audio/wav "
                    "decodes in this environment"
                )
            samples, rate = decode_wav(p.as_py())
            mono = samples.astype(np.float64).mean(axis=1) / 32768.0
            feats.append(
                np.sqrt(_mean_pool_1d(mono * mono, self.feature_dim))
                .astype(np.float32)
            )
            rates.append(rate)
            counts.append(len(mono))
        return (
            batch.drop_columns(["payload"])
            .append_column(
                "features",
                pa.array([f.tolist() for f in feats],
                         pa.list_(pa.float32(), self.feature_dim)),
            )
            .append_column("sample_rate", pa.array(rates, pa.int32()))
            .append_column("n_samples", pa.array(counts, pa.int64()))
        )


class FrameSampler:
    """Actor stage: sample every Nth 'frame' (stubbed: slices payload into
    fixed windows and keeps every `stride`-th)."""

    def __init__(self, frame_bytes: int = 64, stride: int = 2, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "video codec not available; construct with fake=True"
            )
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_frame = [], [], []
        for mid, p in zip(batch.column("media_id"), batch.column("payload")):
            raw = p.as_py()
            frames = [
                raw[i : i + self.frame_bytes]
                for i in range(0, len(raw), self.frame_bytes)
            ]
            for j in range(0, len(frames), self.stride):
                out_id.append(mid.as_py())
                out_idx.append(j)
                out_frame.append(frames[j])
        return pa.table(
            {
                "media_id": pa.array(out_id),
                "frame_index": pa.array(out_idx, pa.int32()),
                "frame": pa.array(out_frame, pa.binary()),
            }
        )


def gen_real_media(n: int, seed: int = 42, size: int = 16) -> pa.Table:
    """Media table whose payloads are REAL encoded bytes the codec-free
    decoders read back: PPM and BMP images plus PCM WAV clips. Every
    ODD row duplicates the previous payload so near-dup pipelines have
    planted exact matches in both modalities."""
    rng = np.random.default_rng(seed)
    ids, types, payloads, metas = [], [], [], []
    for i in range(n):
        ids.append(f"m{i:06d}")
        if i % 2 == 1:
            types.append(types[-1])
            payloads.append(payloads[-1])  # planted duplicate
            metas.append(metas[-1])
            continue
        if (i // 2) % 2 == 0:
            img = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
            types.append("image/x-portable-pixmap")
            payloads.append(encode_ppm(img))
            metas.append('{"w": %d, "h": %d}' % (size, size))
        else:
            samples = (
                np.sin(np.linspace(0, rng.uniform(5, 50), 2048))
                * rng.uniform(0.1, 0.9) * 32767
            ).astype(np.int16)
            types.append("audio/wav")
            payloads.append(encode_wav(samples))
            metas.append('{"sr": 16000}')
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(types),
            "payload": pa.array(payloads, pa.binary()),
            "meta_json": pa.array(metas),
        },
        schema=MEDIA_SCHEMA,
    )


def decode_features(
    media: rd.Dataset,
    feature_dim: int = 16,
    concurrency: int = 2,
    batch_size: int = 256,
    fake: bool = True,
) -> rd.Dataset:
    return media.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"feature_dim": feature_dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(
    media: rd.Dataset, stride: int = 2, concurrency: int = 2,
    batch_size: int = 256,
) -> rd.Dataset:
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride, "fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_near_dup(
    media: rd.Dataset,
    threshold: float = 0.999,
    feature_dim: int = 16,
    **decode_kw,
) -> rd.Dataset:
    """Composition: media payloads -> decode to feature vectors (actor
    pool) -> exact cosine near-dup pairs. The full multimodal dedup path
    a training-data pipeline runs — identical payloads decode to
    identical features and surface at cosine ~1.0. vec ids are the
    digits of media_id (gen_fake_media's mNNNNNN convention); a real
    deployment would carry its own integer key."""
    from .ann import cosine_near_dup_pairs

    feats = decode_features(media, feature_dim=feature_dim, **decode_kw)

    def to_vec(t: pa.Table) -> pa.Table:
        ids = [
            int("".join(ch for ch in m if ch.isdigit()) or "0")
            for m in t.column("media_id").to_pylist()
        ]
        emb = pa.array(
            [
                [float(x) for x in v]
                for v in t.column("features").to_pylist()
            ],
            pa.list_(pa.float64()),
        )
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "embedding": emb}
        )

    return cosine_near_dup_pairs(
        feats.map_batches(to_vec, batch_format="pyarrow"),
        threshold=threshold,
    )
