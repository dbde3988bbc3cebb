"""Multimodal column plumbing (image/audio/video as opaque binary).

The Ray-side machinery — schema, actor-pool signature, batch sizing,
output layout — is real and tested; the codec itself is STUBBED because
image/audio libraries are not available in this environment:

* ``decoder="fake"`` (default) — a deterministic pure-python pseudo-decode
  (dimensions/duration derived from the payload bytes) so the pipeline is
  end-to-end testable;
* ``decoder="pil"`` / ``"librosa"`` — raise ``NotImplementedError`` with a
  clear message at actor construction unless the library imports.

Large binary payloads need small batches: callers should size
``batch_size`` so ``batch_size × payload × concurrency`` fits worker
heaps (see the memory-aware notes in the repo README).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data


class ImageDecode:
    """Actor: binary column → (width, height, channels, feature vector).

    Feature extraction is a deterministic 16-dim byte-histogram projection
    in fake mode — stable plumbing for a real CNN/embedding stage."""

    def __init__(self, payload_col: str = "payload", decoder: str = "fake", feat_dim: int = 16):
        self.payload_col = payload_col
        self.feat_dim = feat_dim
        if decoder == "fake":
            self.decode = self._fake_decode
        elif decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - env has no PIL
                raise NotImplementedError(
                    "real image decoding needs Pillow, which is not available "
                    "in this environment; use decoder='fake'"
                ) from e
            raise NotImplementedError("wire Image.open here when Pillow exists")
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _fake_decode(self, blob: bytes) -> tuple[int, int, int, np.ndarray]:
        h = hashlib.blake2b(blob, digest_size=8).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        arr = np.frombuffer(blob, dtype=np.uint8)
        hist = np.bincount(arr % self.feat_dim, minlength=self.feat_dim).astype(np.float32)
        norm = float(np.linalg.norm(hist))
        if norm > 0:
            hist /= norm
        return width, height, 3, hist

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        w, hgt, ch, feats = [], [], [], []
        for blob in batch[self.payload_col]:
            blob = bytes(blob) if blob is not None else b""
            a, b, c, f = self.decode(blob)
            w.append(a)
            hgt.append(b)
            ch.append(c)
            feats.append(f)
        out = batch.drop(columns=[self.payload_col])
        out["width"] = w
        out["height"] = hgt
        out["channels"] = ch
        out["feature"] = feats
        return out


class AudioFrameSample:
    """Actor: binary audio column → sampled fixed-count frame energies.

    Fake mode derives a deterministic energy series from payload bytes."""

    def __init__(self, payload_col: str = "payload", n_frames: int = 8, decoder: str = "fake"):
        self.payload_col = payload_col
        self.n_frames = n_frames
        if decoder != "fake":
            raise NotImplementedError(
                "real audio decoding needs librosa/soundfile, not available here"
            )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        durs, frames = [], []
        for blob in batch[self.payload_col]:
            blob = bytes(blob) if blob is not None else b""
            arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float32)
            durs.append(len(blob) / 16000.0)
            if arr.size == 0:
                frames.append(np.zeros(self.n_frames, np.float32))
                continue
            chunks = np.array_split(arr, self.n_frames)
            frames.append(np.array([float(np.sqrt(np.mean(c**2))) if c.size else 0.0
                                    for c in chunks], np.float32))
        out = batch.drop(columns=[self.payload_col])
        out["duration_sec"] = durs
        out["frame_energy"] = frames
        return out


def decode_images(ds: "ray.data.Dataset", payload_col: str = "payload",
                  batch_size: int = 64, concurrency: int = 4) -> "ray.data.Dataset":
    """Small batches by design: payloads are large binary."""
    return ds.map_batches(ImageDecode, fn_constructor_kwargs={"payload_col": payload_col},
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=(1, concurrency))


def sample_audio_frames(ds: "ray.data.Dataset", payload_col: str = "payload",
                        batch_size: int = 64, concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(AudioFrameSample, fn_constructor_kwargs={"payload_col": payload_col},
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=(1, concurrency))
