"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns with typed metadata
(kind, width/height or sample-rate, codec).  Decode / resize / feature
extraction are ACTOR-POOL ``map_batches`` stages — model/codec setup in
``__init__``, small ``batch_size`` because payload rows are wide.

The image/audio codec libraries are not available in this container, so
the decode kernels are STUBBED: with ``strict=True`` the stage raises
``NotImplementedError`` exactly where a real decoder would be invoked;
by default a clearly-marked deterministic fake (payload-hash ->
pseudo-pixels) stands in so the Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested end-to-end.

Usage::

    media.map_batches(ImageDecoder, batch_format="pyarrow",
                      batch_size=64, concurrency=(2, 8), num_cpus=1)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON: {width,height} | {sr,n_samples} | {fps,n_frames}
    ]
)


def synth_media(n_rows: int, seed_base: int = 42) -> pa.Table:
    """Deterministic synthetic media table (binary payloads)."""
    kinds = ["image", "audio", "video"]
    ids, kind, payload, meta = [], [], [], []
    for i in range(n_rows):
        k = kinds[i % 3]
        blob = hashlib.blake2b(f"{seed_base}:{i}".encode(), digest_size=32).digest()
        payload.append(blob * (8 + i % 17))
        ids.append(i)
        kind.append(k)
        if k == "image":
            meta.append('{"width":64,"height":48}')
        elif k == "audio":
            meta.append('{"sr":16000,"n_samples":4096}')
        else:
            meta.append('{"fps":24,"n_frames":48}')
    return pa.table(
        {"media_id": ids, "kind": kind, "payload": payload, "meta": meta},
        schema=MEDIA_SCHEMA,
    )


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in decoder: payload hash -> n uniform floats."""
    out = np.empty(n, dtype=np.float32)
    h = b""
    filled = 0
    counter = 0
    while filled < n:
        h = hashlib.blake2b(payload + counter.to_bytes(4, "little"), digest_size=64).digest()
        chunk = np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
        take = min(len(chunk), n - filled)
        out[filled : filled + take] = chunk[:take]
        filled += take
        counter += 1
    return out


class ImageDecoder:
    """Actor-pool image decode -> fixed-size feature vector.

    Real pipeline: ``__init__`` loads the codec/model once per actor;
    ``__call__`` decodes each payload and emits a ``list<float>``
    feature column.  ``strict=True`` raises NotImplementedError at the
    decode call (no image library in this container)."""

    FEATURE_DIM = 64

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:  # real decoder, if ever present
            import PIL.Image  # noqa: F401

            self._have_pil = True
        except ImportError:
            self._have_pil = False

    def _decode(self, payload: bytes) -> np.ndarray:
        if self._have_pil:
            raise NotImplementedError(
                "real PIL decode intentionally not wired in this sandbox"
            )
        if self.strict:
            raise NotImplementedError("image decode requires an image library")
        return _fake_decode(payload, self.FEATURE_DIM)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch.column("payload").to_pylist()]
        col = pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        return batch.drop_columns(["payload"]).append_column("features", col)


class AudioFeatures:
    """Actor-pool audio feature extraction (stubbed decode, real framing).

    Emits per-window energies: n_windows x 1 floats from the decoded
    sample stream (fake-decoded here)."""

    N_WINDOWS = 16

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("payload").to_pylist():
            if self.strict:
                raise NotImplementedError("audio decode requires an audio library")
            samples = _fake_decode(p, 1024)
            win = samples.reshape(self.N_WINDOWS, -1)
            out.append(np.sqrt((win**2).mean(axis=1)).tolist())
        col = pa.array(out, pa.list_(pa.float32()))
        return batch.drop_columns(["payload"]).append_column("energies", col)


class FrameSampler:
    """Video frame sampling plumbing: emits one row per sampled frame
    (flat-map shape) with a fake frame feature."""

    def __init__(self, every_n: int = 8, strict: bool = False):
        self.every_n = every_n
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json as _json

        ids, frames, feats = [], [], []
        for mid, p, meta in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("meta").to_pylist(),
        ):
            if self.strict:
                raise NotImplementedError("video decode requires a codec library")
            n_frames = _json.loads(meta).get("n_frames", 0)
            for f in range(0, n_frames, self.every_n):
                ids.append(mid)
                frames.append(f)
                feats.append(_fake_decode(p + f.to_bytes(4, "little"), 16).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frames, pa.int32()),
                "frame_feat": pa.array(feats, pa.list_(pa.float32())),
            }
        )
