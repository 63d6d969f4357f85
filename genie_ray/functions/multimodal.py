"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are carried as Arrow ``binary`` columns with
sidecar metadata columns (mime, width/height or sample rate, …). The
Ray-side plumbing — schema, small batch sizes for wide rows, actor-pool
stage shape, output layout — is real and tested; the codec itself is
STUBBED (no image/audio libraries in this environment): ``DecodeStub``
raises ``NotImplementedError`` unless constructed with
``fake_decode=True``, in which case it produces a deterministic fake
"decode" (byte-statistics features) so the pipeline shape can be exercised
end to end.

At scale: binary payloads are large → keep ``batch_size`` small (a batch ×
concurrency must fit the worker heap), let blocks stay wide
(``target_max_block_size``), and never groupby/sort on a Dataset still
carrying payload columns — project to features first.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.default_rng(seed)
    ids, mimes, payloads, ws, hs = [], [], [], [], []
    for i in range(n):
        ids.append(i)
        mimes.append(["image/png", "image/jpeg", "audio/wav"][i % 3])
        payloads.append(rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes())
        ws.append(int(rng.integers(16, 512)))
        hs.append(int(rng.integers(16, 512)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "mime": pa.array(mimes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        }
    )


class DecodeStub:
    """Actor-pool decode/feature-extract stage.

    Real deployments replace ``_decode`` with PIL/libsndfile/ffmpeg calls
    (loaded once per actor in ``__init__``). Here ``fake_decode=True``
    computes deterministic byte statistics standing in for decoded
    features; ``fake_decode=False`` raises NotImplementedError, marking
    the codec boundary explicitly.
    """

    def __init__(self, fake_decode: bool = False, feature_dim: int = 8):
        self.fake_decode = fake_decode
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes, mime: str) -> np.ndarray:
        if not self.fake_decode:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "construct DecodeStub(fake_decode=True) for the deterministic stand-in"
            )
        # deterministic stand-in: chunked byte means (pure function of payload)
        arr = np.frombuffer(payload, dtype=np.uint8)
        chunks = np.array_split(arr, self.feature_dim)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, shas = [], []
        for payload, mime in zip(
            batch["payload"].to_pylist(), batch["mime"].to_pylist()
        ):
            feats.append(self._decode(payload, mime).tolist())
            shas.append(hashlib.sha256(payload).hexdigest())
        out = batch.drop_columns(["payload"])  # features replace payload
        out = out.append_column("payload_sha256", pa.array(shas, pa.string()))
        return out.append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        )


def decode_features(
    ds: ray.data.Dataset,
    fake_decode: bool = False,
    concurrency: int = 2,
    batch_size: int = 16,  # small: payload rows are wide
    decoder: str = "stub",  # "stub" | "pillow" (requires Pillow)
) -> ray.data.Dataset:
    if decoder == "pillow":
        return ds.map_batches(
            PillowDecode,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"fake_decode": fake_decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class PillowDecode:
    """Real image-decode actor stage, activated when PIL is importable
    (the HF-backend pattern, `core/hf_backend.py`): the import happens
    ONCE per actor in ``__init__``; each batch decodes payload bytes to
    RGB pixel arrays and emits mean-RGB + decoded-size features. In this
    sandbox PIL is absent, so construction raises ImportError and the
    pipeline stays on :class:`DecodeStub`; with Pillow installed the
    stage is a drop-in for ``decode_features(..., decoder="pillow")``.
    Non-image mimes (and undecodable payloads) yield null features, not
    a crashed batch — at corpus scale a poison payload must not kill the
    stage."""

    def __init__(self, feature_dim: int = 8):
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # honest capability gate
            raise ImportError(
                "PillowDecode requires Pillow; this environment has no "
                "image codecs — use DecodeStub(fake_decode=True)"
            ) from e
        import io

        self._Image = Image
        self._io = io
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes, mime: str):
        if not mime.startswith("image/"):
            return None
        try:
            img = self._Image.open(self._io.BytesIO(payload)).convert("RGB")
        except Exception:
            return None
        arr = np.asarray(img, dtype=np.float64)
        rgb = arr.mean(axis=(0, 1))
        pad = np.zeros(max(0, self.feature_dim - 5), np.float64)
        return np.concatenate(
            [rgb, [float(img.width), float(img.height)], pad]
        )[: self.feature_dim]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, shas = [], []
        for payload, mime in zip(
            batch["payload"].to_pylist(), batch["mime"].to_pylist()
        ):
            f = self._decode(payload, mime)
            feats.append(None if f is None else f.tolist())
            shas.append(hashlib.sha256(payload).hexdigest())
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload_sha256", pa.array(shas, pa.string()))
        return out.append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        )


def pillow_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


class ResizeStub:
    """Actor-pool resize stage (metadata-exact, codec-stubbed): computes
    the aspect-preserving box-fit target size with PURE INTEGER math —
    ``scale to fit box×box, never upscale`` — so the result is
    SQL-oracle-able; the pixel resample itself is the stubbed codec
    boundary (a real deployment decodes + resamples here, loaded once
    per actor). Emits the payload sha256 so the binary column's
    integrity is verified through the stage. Output: (media_id, mime,
    payload_sha256, width, height, out_w, out_h)."""

    def __init__(self, box: int = 256):
        self.box = box

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        long_side = np.maximum(np.maximum(w, h), 1)
        # floor-div box-fit; no upscale (scale capped at 1 ⇔ long ≤ box)
        out_w = np.where(long_side <= self.box, w,
                         np.maximum(w * self.box // long_side, 1))
        out_h = np.where(long_side <= self.box, h,
                         np.maximum(h * self.box // long_side, 1))
        shas = [
            hashlib.sha256(p).hexdigest()
            for p in batch["payload"].to_pylist()
        ]
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload_sha256", pa.array(shas, pa.string()))
        out = out.append_column("out_w", pa.array(out_w, pa.int64()))
        return out.append_column("out_h", pa.array(out_h, pa.int64()))


class FrameSample:
    """Actor-pool frame-sampling stage for video-like payloads: the
    payload is treated as ``n_frames = octet_length // frame_bytes``
    fixed-size frames (the codec-free stand-in for a real demuxer —
    which would replace exactly this arithmetic, loaded once per
    actor); ``k`` frames are sampled at evenly spaced indices
    ``i·(n−1)//(k−1)`` (deduped, pure integers). One output ROW PER
    SAMPLED FRAME (the flat_map explosion a downstream encoder
    consumes): (media_id, frame_idx, byte_offset, byte_len,
    frame_sha256). Offsets/lengths are SQL-oracle-able; the per-frame
    sha256 is verified against hashlib in the unit test."""

    def __init__(self, frame_bytes: int = 1024, k: int = 4):
        self.frame_bytes = frame_bytes
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, offs, lens, shas = [], [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n = len(payload) // self.frame_bytes
            if n == 0:
                continue
            if self.k == 1 or n == 1:
                picks = [0]
            else:
                picks = sorted(
                    {i * (n - 1) // (self.k - 1) for i in range(self.k)}
                )
            for f in picks:
                off = f * self.frame_bytes
                ids.append(mid)
                idxs.append(f)
                offs.append(off)
                lens.append(self.frame_bytes)
                shas.append(
                    hashlib.sha256(
                        payload[off:off + self.frame_bytes]
                    ).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "byte_offset": pa.array(offs, pa.int64()),
                "byte_len": pa.array(lens, pa.int64()),
                "frame_sha256": pa.array(shas, pa.string()),
            }
        )


def resize_media(
    ds: ray.data.Dataset, box: int = 256, concurrency: int = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    return ds.map_batches(
        ResizeStub, fn_constructor_kwargs={"box": box},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(
    ds: ray.data.Dataset, frame_bytes: int = 1024, k: int = 4,
    concurrency: int = 2, batch_size: int = 16,
) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "k": k},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
