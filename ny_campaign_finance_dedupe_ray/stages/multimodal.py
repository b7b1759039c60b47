"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBS (the image/audio codecs are not in
this container): ``DecodeImage`` raises ``NotImplementedError`` unless
constructed with ``fake=True``, in which case a deterministic fake decoder
(seeded from the payload bytes) produces stable pseudo-features so the
Ray-side plumbing — schema, batch sizing, actor signature, output layout —
is real and tested end-to-end.

Scale notes: binary payloads are wide, so these stages run with SMALL batch
sizes and ``batch_format='pyarrow'`` (binary columns don't round-trip pandas
cleanly); payload columns are dropped as soon as features are extracted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("kind", pa.string()),       # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding from payload bytes (no codecs)."""
    seed = int.from_bytes((payload or b"\0")[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


class DecodeImage:
    """Actor: decode + resize + feature-extract an image payload column.

    Real decode requires an image codec library (absent here) — pass
    ``fake=True`` for the deterministic fake used in tests; otherwise the
    first batch raises NotImplementedError with a clear message."""

    def __init__(self, target_size: tuple[int, int] = (224, 224),
                 feature_dim: int = 64, fake: bool = False):
        self.target_size = target_size
        self.feature_dim = feature_dim
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires a codec library not present in this "
                "environment; construct DecodeImage(fake=True) for the "
                "deterministic fake decoder"
            )
        payloads = batch.column("payload").to_pylist()
        feats = [_fake_feature(p, self.feature_dim) for p in payloads]
        out = pa.table(
            {
                "media_id": batch.column("media_id"),
                "width_out": pa.array(
                    [self.target_size[0]] * len(payloads), pa.int32()
                ),
                "height_out": pa.array(
                    [self.target_size[1]] * len(payloads), pa.int32()
                ),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )
        return out


class SampleFrames:
    """Actor: sample ``n_frames`` evenly spaced pseudo-frames from a video
    payload — one output row per (media_id, frame_idx)."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decode requires a codec library not present here; "
                "construct SampleFrames(fake=True) for the fake sampler"
            )
        ids, idxs, ts = [], [], []
        mids = batch.column("media_id").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        for mid, dur in zip(mids, durs):
            d = dur or 0
            for f in range(self.n_frames):
                ids.append(mid)
                idxs.append(f)
                ts.append(int(d * f / max(self.n_frames - 1, 1)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "t_ms": pa.array(ts, pa.int32()),
            }
        )


def decode_images(
    media: "ray.data.Dataset",
    fake: bool = False,
    batch_size: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Image rows -> feature rows; small batches because payloads are wide."""
    return media.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(
    media: "ray.data.Dataset",
    n_frames: int = 4,
    fake: bool = False,
    batch_size: int = 16,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    return media.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    rows = {
        "media_id": [f"m{i:05d}" for i in range(n)],
        "kind": [("image", "video")[i % 2] for i in range(n)],
        "payload": [rng.bytes(128) for _ in range(n)],
        "mime": ["image/fake" if i % 2 == 0 else "video/fake" for i in range(n)],
        "width": [640] * n,
        "height": [480] * n,
        "duration_ms": [0 if i % 2 == 0 else 4000 for i in range(n)],
    }
    return pa.table(
        {k: pa.array(v, MEDIA_SCHEMA.field(k).type) for k, v in rows.items()}
    )
