"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns with typed metadata
(kind, width/height or sample-rate, codec).  Decode / resize / feature
extraction are ACTOR-POOL ``map_batches`` stages — model/codec setup in
``__init__``, small ``batch_size`` because payload rows are wide.

Decode is capability-detected per stage (``decode="auto"|"real"|"fake"``):
when the codec library imports (Pillow for images, soundfile for audio)
the kernel decodes for REAL; otherwise a clearly-marked deterministic
fake (payload-hash -> pseudo-pixels) stands in so the Ray-side plumbing
— schema, actor signature, batch sizing, output layout — is real and
tested end-to-end even in codec-less containers.  ``decode="real"``
raises ImportError up front if the library is missing; ``strict=True``
turns the auto-mode fallback into an error instead of a fake.

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

    ``__init__`` resolves the codec once per actor; ``__call__`` decodes
    each payload and emits a ``list<float>`` feature column (grayscale
    ``sqrt(FEATURE_DIM)``-square thumbnail, row-major, [0,1] floats).
    ``decode``: "real" requires Pillow (ImportError otherwise), "fake"
    forces the deterministic stub, "auto" (default) decodes for real
    when Pillow imports and falls back to the stub — or, with
    ``strict=True``, to NotImplementedError — when it does not."""

    FEATURE_DIM = 64

    def __init__(self, strict: bool = False, decode: str = "auto"):
        if decode not in ("auto", "real", "fake"):
            raise ValueError(f"decode={decode!r}")
        self.strict = strict
        self._pil = None
        if decode in ("auto", "real"):
            try:
                from PIL import Image

                self._pil = Image
            except ImportError:
                if decode == "real":
                    raise ImportError(
                        "ImageDecoder(decode='real') requires Pillow")

    def _decode(self, payload: bytes) -> np.ndarray:
        if self._pil is not None:
            import io

            side = int(self.FEATURE_DIM ** 0.5)
            img = self._pil.open(io.BytesIO(payload)).convert("L")
            img = img.resize((side, side))
            return (np.asarray(img, dtype=np.float32) / 255.0).reshape(-1)
        if self.strict:
            raise NotImplementedError("image decode requires an image library")
        return _fake_decode(payload, self.FEATURE_DIM)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch.column("payload").to_pylist()]
        col = pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        return batch.drop_columns(["payload"]).append_column("features", col)


class AudioFeatures:
    """Actor-pool audio feature extraction (real framing; decode is
    capability-detected like ImageDecoder).

    Emits per-window RMS energies: ``N_WINDOWS`` floats from the decoded
    sample stream.  Real path reads any soundfile-supported container
    (WAV/FLAC/OGG) and pads the tail window with zeros."""

    N_WINDOWS = 16

    def __init__(self, strict: bool = False, decode: str = "auto"):
        if decode not in ("auto", "real", "fake"):
            raise ValueError(f"decode={decode!r}")
        self.strict = strict
        self._sf = None
        if decode in ("auto", "real"):
            try:
                import soundfile

                self._sf = soundfile
            except ImportError:
                if decode == "real":
                    raise ImportError(
                        "AudioFeatures(decode='real') requires soundfile")

    def _samples(self, payload: bytes) -> np.ndarray:
        if self._sf is not None:
            import io

            data, _sr = self._sf.read(io.BytesIO(payload), dtype="float32")
            if data.ndim > 1:  # downmix to mono
                data = data.mean(axis=1)
            pad = (-len(data)) % self.N_WINDOWS
            if pad or len(data) == 0:
                data = np.pad(data, (0, pad or self.N_WINDOWS))
            return data
        if self.strict:
            raise NotImplementedError("audio decode requires an audio library")
        return _fake_decode(payload, 1024)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("payload").to_pylist():
            win = self._samples(p).reshape(self.N_WINDOWS, -1)
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
