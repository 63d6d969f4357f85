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
) -> ray.data.Dataset:
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"fake_decode": fake_decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
