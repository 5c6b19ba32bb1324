"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a
``media_type`` string; decode / feature-extract / resize /
frame-sample are actor-pool map_batches stages. The actual codecs are
NOT in this container, so the decode kernel is STUBBED: with
``deterministic_stub=True`` it produces a fake-but-deterministic
decode (dimensions and features derived from the payload digest);
otherwise it raises NotImplementedError naming the missing dependency.
The Ray-side plumbing — schema, batch sizing for wide binary rows,
actor signature, output layout — is real and tested.

Scale notes: binary rows are wide; callers should pass a SMALL
batch_size (default 64) and rely on streaming backpressure, and block
size should be bounded via DataContext.target_max_block_size when
payloads are multi-MB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
    ]
)


def _digest_floats(data: bytes, n: int) -> np.ndarray:
    """n deterministic floats in [0,1) from a payload digest.

    The chain hashes ASCII hex digests (not raw digest bytes) so an
    independent SQL oracle can reproduce it: DuckDB's sha256() accepts
    only VARCHAR, and hex digests are valid ASCII at every step."""
    out = np.empty(n, dtype=np.float64)
    h = hashlib.sha256(data).hexdigest()
    buf = b""
    while len(buf) < n * 8:
        h = hashlib.sha256(h.encode("ascii")).hexdigest()
        buf += bytes.fromhex(h)
    raw = np.frombuffer(buf[: n * 8], dtype="<u8")
    out[:] = (raw >> 11) / float(1 << 53)
    return out


class DecodeMedia:
    """payload -> (width, height, n_frames, duration_ms) metadata.

    Real implementation requires Pillow / libav — not present here.
    """

    def __init__(self, deterministic_stub: bool = False):
        if not deterministic_stub:
            raise NotImplementedError(
                "media decoding needs Pillow/libav which are not installed in "
                "this environment; pass deterministic_stub=True for the "
                "schema/plumbing path"
            )

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_numpy()
        payloads = t["payload"].to_pylist()
        w, h, nf, dur = [], [], [], []
        for p in payloads:
            d = _digest_floats(p or b"", 4)
            w.append(int(64 + d[0] * 1984))
            h.append(int(64 + d[1] * 1016))
            nf.append(int(1 + d[2] * 299))
            dur.append(int(d[3] * 600_000))
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64)),
                "media_type": t["media_type"],
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "n_frames": pa.array(nf, pa.int32()),
                "duration_ms": pa.array(dur, pa.int64()),
                "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            }
        )


class MediaFeatures:
    """payload -> fixed-size feature vector (stub: digest-derived).

    The real stage would run batched model inference — the actor shape
    (model load in __init__, batched __call__) is exactly what a CLIP/
    whisper encoder needs.
    """

    def __init__(self, dim: int = 16, deterministic_stub: bool = False):
        if not deterministic_stub:
            raise NotImplementedError("feature model not available in this environment")
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [
            _digest_floats(p or b"", self.dim).astype(np.float32)
            for p in t["payload"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": t["media_id"].cast(pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class FrameSample:
    """'video' payload -> n_samples deterministic byte-range frames."""

    def __init__(self, n_samples: int = 4, deterministic_stub: bool = False):
        if not deterministic_stub:
            raise NotImplementedError("video demuxing not available in this environment")
        self.n = n_samples

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for i, p in zip(t["media_id"].to_numpy(), t["payload"].to_pylist()):
            p = p or b""
            step = max(1, len(p) // self.n)
            for s in range(self.n):
                ids.append(int(i))
                fidx.append(s)
                frames.append(p[s * step : (s + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def decode_media(ds: rd.Dataset, stub: bool = True, batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs=dict(deterministic_stub=stub),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )


def media_features(ds: rd.Dataset, dim: int = 16, stub: bool = True, batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(
        MediaFeatures,
        fn_constructor_kwargs=dict(dim=dim, deterministic_stub=stub),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )


def frame_sample(ds: rd.Dataset, n_samples: int = 4, stub: bool = True, batch_size: int = 16) -> rd.Dataset:
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs=dict(n_samples=n_samples, deterministic_stub=stub),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )
