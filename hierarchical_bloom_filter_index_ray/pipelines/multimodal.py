"""Multimodal column plumbing (build-brief requirement).

Images/audio/video are opaque ``binary`` columns with typed metadata. The
decode kernels are STUBBED (no image/audio libs in this container): pass
``decoder="fake"`` for a deterministic fake decode that exercises the real
Ray-side plumbing (schema, batch sizing, actor signature, output layout);
the default ``decoder="real"`` raises ``NotImplementedError`` at the
point a codec library would be called.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..state.splitmix import hash_u64

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),       # opaque encoded bytes
    ("media_type", pa.string()),    # "image/png" | "audio/wav" | ...
    ("width", pa.int32()),          # typed metadata (nullable)
    ("height", pa.int32()),
])


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize binary media payloads.

    Real deployments load the codec/model once per actor here
    (``__init__``); per-batch work is batched decode + feature extraction.
    ``feature_dim`` floats per item are emitted as ``list<float>``.
    """

    def __init__(self, *, decoder: str = "real", feature_dim: int = 16,
                 seed: int = 42):
        self.decoder = decoder
        self.feature_dim = feature_dim
        self.seed = seed
        if decoder == "real":
            # A real build would do:  import PIL / torchaudio / cv2 ...
            # The libs are not in this container; fail at construction so
            # the error surfaces at pool start, not mid-stream.
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "use decoder='fake' for the deterministic stub")
        if decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")

    def _fake_decode(self, payloads: list[bytes]) -> np.ndarray:
        """Deterministic stand-in: features = seeded hash-mix of payload
        bytes, shaped like a real embedding batch."""
        out = np.empty((len(payloads), self.feature_dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            base = np.frombuffer(p, dtype=np.uint8)
            acc = np.uint64(len(p))
            h = hash_u64(
                np.resize(base.astype(np.uint64), self.feature_dim)
                + np.arange(self.feature_dim, dtype=np.uint64),
                self.seed) if len(base) else np.zeros(self.feature_dim,
                                                      dtype=np.uint64)
            out[i] = (h >> np.uint64(40)).astype(np.float32) / float(1 << 24)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = self._fake_decode(payloads)
        offsets = np.arange(0, (len(payloads) + 1) * self.feature_dim,
                            self.feature_dim, dtype=np.int32)
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "features": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(feats.reshape(-1), pa.float32())),
        })


def extract_features(ds: "rd.Dataset", *, decoder: str = "fake",
                     feature_dim: int = 16, seed: int = 42,
                     batch_size: int = 64, concurrency: int = 2
                     ) -> "rd.Dataset":
    """Media featurization pipeline. Small ``batch_size`` by design: large
    binary payloads x concurrency must fit the worker heap."""
    return ds.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"decoder": decoder,
                               "feature_dim": feature_dim, "seed": seed})


class ImageResizer:
    """Actor-pool resize stage (STUB): real impl would decode -> resize ->
    re-encode per batch with PIL/cv2 loaded once per actor. The fake path
    rewrites the typed metadata and passes payloads through so the schema
    and batch plumbing are exercised."""

    def __init__(self, *, width: int, height: int, decoder: str = "real"):
        if decoder == "real":
            raise NotImplementedError(
                "image codecs unavailable; use decoder='fake'")
        self.width, self.height = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return (batch.set_column(batch.schema.get_field_index("width"),
                                 "width",
                                 pa.array([self.width] * n, pa.int32()))
                .set_column(batch.schema.get_field_index("height"),
                            "height",
                            pa.array([self.height] * n, pa.int32())))


class FrameSampler:
    """Video frame-sampling stage (STUB): emits ``n_frames`` fake frame
    rows per media item (flat_map-shaped output: one row per frame) with
    deterministic frame ids — the real impl would seek/decode keyframes."""

    def __init__(self, *, n_frames: int, decoder: str = "real"):
        if decoder == "real":
            raise NotImplementedError(
                "video codecs unavailable; use decoder='fake'")
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        rep = np.repeat(np.arange(n), self.n_frames)
        frame_no = np.tile(np.arange(self.n_frames, dtype=np.int32), n)
        return pa.table({
            "media_id": batch["media_id"].take(pa.array(rep)),
            "frame_no": pa.array(frame_no, pa.int32()),
            "payload": batch["payload"].take(pa.array(rep)),
        })


def synth_media(n: int, *, seed: int = 42) -> "rd.Dataset":
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    def gen(batch: dict) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        payloads = [
            bytes(((hash_u64(np.arange(64, dtype=np.uint64)
                             + np.uint64(i), seed)) & np.uint64(255))
                  .astype(np.uint8).tolist())
            for i in ids]
        return pa.table({
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/fake"] * len(ids), pa.string()),
            "width": pa.array([8] * len(ids), pa.int32()),
            "height": pa.array([8] * len(ids), pa.int32()),
        })
    return rd.range(n).map_batches(gen, batch_format="numpy")
