"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `payload: binary` columns with metadata
(`media_type`, `width/height` or `sample_rate`, ...). Decode / resize /
feature-extract / frame-sample run as actor-pool map_batches stages: the
heavy library (PIL/ffmpeg/torchaudio) would load once per actor in
__init__. Those libraries are NOT in this container, so the codec calls
are STUBBED: `DecodeImage(fake=False)` raises NotImplementedError at
construction; `fake=True` swaps in a deterministic fake decoder so the
Ray-side plumbing — schema, batch sizing, actor signature, output layout —
is real and tested.

Batch-size note for 100 TB: binary payloads make rows wide; keep
`batch_size` small (<=256 here) and `target_max_block_size` at default so
a batch x concurrency fits worker heaps; blocks spill to the object store
rather than ballooning Python memory.
"""

from __future__ import annotations

import hashlib

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


class DecodeImage:
    """Actor stage: payload bytes -> fixed-size float feature vector.

    Real implementation would do `PIL.Image.open(BytesIO(payload))` +
    resize in __call__ with the library imported once here in __init__.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "construct with fake=True for the deterministic stub"
            )
        self.feature_dim = feature_dim

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-features: digest-seeded uniform vector
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        return rng.random(self.feature_dim, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode_fake(p.as_py()) for p in batch.column("payload")
        ]
        arr = pa.array(
            [f.tolist() for f in feats], pa.list_(pa.float32(), self.feature_dim)
        )
        return batch.drop_columns(["payload"]).append_column("features", arr)


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


def decode_features(
    media: rd.Dataset,
    feature_dim: int = 16,
    concurrency: int = 2,
    batch_size: int = 256,
) -> rd.Dataset:
    return media.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"feature_dim": feature_dim, "fake": True},
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
