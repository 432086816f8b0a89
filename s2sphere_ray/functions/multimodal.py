"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with metadata columns
(``mime, width, height, duration_ms``). Decode / feature-extraction /
resize / frame-sample are actor-pool ``map_batches`` stages; the actual
codec work is STUBBED (no image/audio libraries in this container — the
decode body raises ``NotImplementedError`` unless ``fake=True``, which
produces deterministic fake features so the Ray-side plumbing — schema,
batch sizes, actor signature, output layout — is real and tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media_table(count: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (binary payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=64, dtype=np.uint8).tobytes() for _ in range(count)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(count, dtype=np.int64)),
            "mime": pa.array(["image/fake"] * count),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(16, 512, count).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, count).astype(np.int32)),
        }
    )


class ImageFeatureStage:
    """Actor stage: payload → feature vector (``list<float32>[dim]``).

    Real decoders would be loaded once here in ``__init__``; with
    ``fake=True`` features are a deterministic hash-seeded projection of the
    payload bytes (stable across runs/workers).
    """

    def __init__(self, dim: int = 16, fake: bool = True):
        self.dim = dim
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires a codec library not present in this "
                "container; run with fake=True for plumbing tests"
            )
        col = batch["payload"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        dim = self.dim
        # Deterministic fake feature: per-row byte stream split into `dim`
        # contiguous chunks (np.array_split sizing), chunk means. Fully
        # vectorized off the Arrow binary buffers: one prefix sum over the
        # value buffer, then (n, dim) segment-sum differences.
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        lens = np.diff(offsets)
        cs = np.concatenate([[0], np.cumsum(data, dtype=np.int64)])
        q, r = np.divmod(lens, dim)
        kk = np.arange(dim, dtype=np.int64)
        # Chunk k of row i starts at k*q_i + min(k, r_i), np.array_split's
        # split points.
        rel_start = kk[None, :] * q[:, None] + np.minimum(kk[None, :], r[:, None])
        rel_end = (kk[None, :] + 1) * q[:, None] + np.minimum(
            kk[None, :] + 1, r[:, None]
        )
        abs_start = offsets[:-1, None] + rel_start
        abs_end = offsets[:-1, None] + rel_end
        sizes = rel_end - rel_start
        sums = cs[abs_end] - cs[abs_start]
        with np.errstate(invalid="ignore"):
            feats = np.where(sizes > 0, sums / np.maximum(sizes, 1), 0.0)
        # Empty / NULL payloads behave as a single zero byte (chunk 0 of
        # size 1, zero mean) — matching the scalar b"\0" fallback.
        feats = feats.astype(np.float32)
        return batch.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), dim
            ),
        )


def extract_features(media_ds, dim: int = 16, concurrency=(1, 4), batch_size: int = 256):
    """Feature-extraction pipeline stage (small batches: wide binary rows)."""
    return media_ds.map_batches(
        ImageFeatureStage,
        fn_constructor_kwargs=dict(dim=dim, fake=True),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
