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


class ResizeStage:
    """Actor stage: (payload, width, height) → resized payload + dims.

    Real decoders/resamplers would load once in ``__init__``; with
    ``fake=True`` the "resized" payload is a deterministic byte slice
    proportional to the target area (plumbing-real: metadata columns
    update, schema stays stable, wide-binary batches stay small)."""

    def __init__(self, target: int = 64, fake: bool = True):
        self.target = target
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image resize requires a codec library not present in this "
                "container; run with fake=True for plumbing tests"
            )
        col = batch["payload"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        w = batch["width"].to_numpy().astype(np.int64)
        h = batch["height"].to_numpy().astype(np.int64)
        scale_w = np.minimum(w, self.target)
        scale_h = np.minimum(h, self.target)
        # Fake resample: keep ceil(len * area_ratio) payload bytes.
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        lens = np.diff(offsets)
        ratio = (scale_w * scale_h) / np.maximum(1, w * h)
        keep = np.maximum(1, np.ceil(lens * ratio)).astype(np.int64)
        keep = np.minimum(keep, lens)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        new_off = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(keep, out=new_off[1:].view(np.int32)[: n])
        out_bytes = np.empty(int(keep.sum()), dtype=np.uint8)
        within = (
            np.arange(int(keep.sum()), dtype=np.int64)
            - np.repeat(new_off[:-1].astype(np.int64), keep)
        )
        out_bytes[:] = data[np.repeat(offsets[:-1], keep) + within]
        payload = pa.Array.from_buffers(
            pa.binary(),
            n,
            [None, pa.py_buffer(new_off.tobytes()), pa.py_buffer(out_bytes.tobytes())],
        )
        batch = batch.drop_columns(["payload", "width", "height"])
        batch = batch.append_column("payload", payload)
        batch = batch.append_column(
            "width", pa.array(scale_w.astype(np.int32), pa.int32())
        )
        return batch.append_column(
            "height", pa.array(scale_h.astype(np.int32), pa.int32())
        )


class FrameSampleStage:
    """Actor stage: one row per sampled frame (video → frames flat-map).

    ``fake=True`` treats the payload as ``n_frames`` equal byte slices and
    emits every ``stride``-th one — the row-expansion plumbing (1→k rows,
    per-frame metadata, stable schema) is real."""

    def __init__(self, n_frames: int = 16, stride: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.stride = stride
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decode requires a codec library not present in this "
                "container; run with fake=True for plumbing tests"
            )
        col = batch["payload"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        picks = np.arange(0, self.n_frames, self.stride, dtype=np.int64)
        k = len(picks)
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        lens = np.diff(offsets)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        media_id = batch["media_id"].to_numpy()
        # Frame f of row i = payload slice [f*L/n_frames, (f+1)*L/n_frames).
        fstart = (
            offsets[:-1, None]
            + (picks[None, :] * lens[:, None]) // self.n_frames
        ).reshape(-1)
        fend = (
            offsets[:-1, None]
            + ((picks[None, :] + 1) * lens[:, None]) // self.n_frames
        ).reshape(-1)
        flens = fend - fstart
        new_off = np.zeros(n * k + 1, dtype=np.int32)
        np.cumsum(flens, out=new_off[1:].view(np.int32)[: n * k])
        total = int(flens.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            new_off[:-1].astype(np.int64), flens
        )
        out_bytes = data[np.repeat(fstart, flens) + within]
        frames = pa.Array.from_buffers(
            pa.binary(),
            n * k,
            [None, pa.py_buffer(new_off.tobytes()), pa.py_buffer(out_bytes.tobytes())],
        )
        return pa.table(
            {
                "media_id": pa.array(np.repeat(media_id, k)),
                "frame_idx": pa.array(
                    np.tile(picks, n).astype(np.int64)
                ),
                "frame_payload": frames,
            }
        )


def sample_frames(media_ds, n_frames: int = 16, stride: int = 4,
                  concurrency=(1, 4), batch_size: int = 256):
    """Frame-sampling pipeline stage (1 → k row expansion, actor pool)."""
    return media_ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(n_frames=n_frames, stride=stride, fake=True),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
