"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video ride as `binary` columns with metadata columns alongside —
the same pattern the reference uses for page images in its parquet feature
table (``/root/reference/docling_jobkit/convert/results_processor.py:355-365``,
``page_images: list<binary>``).  The Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested; the actual codec work is
STUBBED deterministically because no image/audio library exists in this
container (brief: stub the decode, make the plumbing real).

Scale notes: binary payload stages must run with SMALL batch_size (payload
bytes x batch_size x concurrency must fit the worker heap) — callers pass
``batch_size=8..32`` for multi-MB payloads, and the decode pool is sized via
``concurrency`` / ``num_cpus`` like any heavy stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    import random

    rng = random.Random(seed)
    cols = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n_rows):
        kind = ("image", "audio", "video")[i % 3]
        size = rng.randint(200, 4000)
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (size // 32 + 1)
        cols["media_id"].append(i)
        cols["kind"].append(kind)
        cols["payload"].append(payload[:size])
        cols["mime"].append({"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}[kind])
        cols["width"].append(rng.randint(64, 1920) if kind != "audio" else -1)
        cols["height"].append(rng.randint(64, 1080) if kind != "audio" else -1)
        cols["duration_ms"].append(rng.randint(500, 60000) if kind != "image" else -1)
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in MEDIA_SCHEMA], schema=MEDIA_SCHEMA
    )


class _FakeCodec:
    """Deterministic stand-in for a real decoder.  Real codecs (PIL/ffmpeg)
    are NOT in this container; swap this class, keep the stage."""

    @staticmethod
    def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
        raise NotImplementedError(
            "real image decode requires PIL/libvips — not available in this "
            "container; DeterministicFeatures below uses the byte stream "
            "directly as the stand-in signal"
        )

    @staticmethod
    def byte_histogram(payload: bytes) -> np.ndarray:
        return np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)


class MediaFeatureExtractor:
    """Actor-pool UDF: payload -> fixed-size feature vector + content hash.

    Stage shape matches a real model-inference stage: state (the "model" —
    here a projection matrix) loads once per actor in __init__; __call__ is
    batched; output is a compact feature column much smaller than the input
    payload (so the write stage stays light)."""

    def __init__(self, feature_dim: int = 32, seed: int = 31):
        rng = np.random.RandomState(seed)
        self.proj = rng.standard_normal((256, feature_dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats, hashes = [], []
        for p in payloads:
            hist = _FakeCodec.byte_histogram(p).astype(np.float32)
            hist /= max(1.0, hist.sum())
            feats.append((hist @ self.proj).tolist())
            hashes.append(hashlib.sha256(p).hexdigest())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "content_hash": pa.array(hashes, pa.string()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Actor-pool UDF: video rows -> frame-sample rows (flat-map shape).

    Deterministic fake: emits one "frame" row per second of duration capped
    at max_frames, with a byte-slice of the payload standing in for decoded
    frame bytes.  A real implementation swaps the slicing for ffmpeg."""

    def __init__(self, max_frames: int = 8):
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_index": [], "ts_ms": [], "frame_bytes": []}
        for mid, kind, payload, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            if kind != "video" or dur <= 0:
                continue
            n = min(self.max_frames, max(1, dur // 1000))
            step = max(1, len(payload) // n)
            for f in range(n):
                out["media_id"].append(mid)
                out["frame_index"].append(f)
                out["ts_ms"].append(int(f * dur / n))
                out["frame_bytes"].append(payload[f * step : (f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_index": pa.array(out["frame_index"], pa.int32()),
                "ts_ms": pa.array(out["ts_ms"], pa.int32()),
                "frame_bytes": pa.array(out["frame_bytes"], pa.binary()),
            }
        )


def media_features_pipeline(media_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Feature extraction with payload-aware batch sizing (small batches,
    binary payloads never hit pandas)."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16,
        concurrency=(1, 4),
    )


def frame_sample_pipeline(media_ds: ray.data.Dataset) -> ray.data.Dataset:
    return media_ds.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8,
        concurrency=(1, 4),
    )
