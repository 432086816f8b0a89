"""Distributed linear-classifier training over an embedding column —
the model-in-the-loop curation primitive of large-scale training-data
pipelines (train a small quality/topic probe on labeled vectors, then
score the whole corpus with it; cf. fastText-style quality filters in
CCNet/Gopher-class curation stacks).

The trainer is the **batch perceptron**: ``iters`` full passes, each
computing the summed update ``w += Σ_{y·(w·x) ≤ 0} y·x`` over every
misclassified row.  The update is a plain sum, so each pass is one
streaming ``map_batches`` over the (materialized, quantized) working
set with the current weight vector broadcast via ``ray.put``, followed
by a tiny ``(dim, partial)`` exchange — identical physics to
``sim.kmeans_milli``: per-pass shuffle volume is ``D`` rows per block,
never the data.

Everything runs in exact integer milli-unit arithmetic
(``m = floor(v·scale)`` as int64, weights int64), so the trained
weights, scores and predictions are bit-reproducible across block
layouts AND replayable in SQL (queries._sql_perceptron unrolls the
same passes as CTEs).  Exactness bound: ``|w·x| ≤ D·max|m|·max|w|``
must stay below 2⁶³ — asserted every pass; with unit-norm embeddings,
scale 1000 and a trillion rows the bound allows ~10⁵ full-corpus
passes before the guard fires, far beyond any real probe-training run.

Determinism contract (mirrored line for line by the SQL oracle):

* quantize once: ``m = floor(v * scale)`` as int64;
* ``y = +1`` if ``label == target_label`` else ``-1``;
* ``w`` starts at the zero vector;
* pass t: ``s_i = Σ_d m_id · w_d`` (exact int64);
  ``w ← w + Σ_{i : y_i·s_i ≤ 0} y_i · m_i`` (classic batch update,
  unit learning rate — scale-free since only sign(s) matters);
* output: one row per vector ``(vec_id, label, y, score, pred)`` with
  ``score`` from the final weights and ``pred = +1 iff score > 0``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_INT63 = (1 << 62)

# rows × dim cells below which the perceptron trains in-process
# (the budgeted-sum idiom); 2M int64 cells = 16 MB driver-side.
_CLS_GATHER_CELLS = 2_000_000


def perceptron_milli(
    ds,
    target_label: int = 0,
    iters: int = 3,
    id_col: str = "vec_id",
    col: str = "embedding",
    label_col: str = "label",
    scale: int = 1000,
):
    """Train a one-vs-rest batch perceptron on ``ds`` and return the
    per-vector scoring Dataset ``(vec_id, label, y, score, pred)``.

    ``ds`` must carry an integer id column, an integer label column and
    a ``list<float>`` embedding column of uniform dimension.
    """
    import ray as _ray
    from ray.data.aggregate import Sum

    from .sim import _emb_matrix

    # Probe the embedding dimension ONCE (1-row limited read) so every
    # quantize block — including empty ones at high partition counts —
    # emits the same fixed_size_list[D] type; deriving D per batch gave
    # empty blocks fixed_size_list[0], a block-schema mismatch
    # (round-4 review).
    probe0 = ds.take(1)
    if not probe0:
        return _rd_empty()
    dim = len(probe0[0][col])

    def quantize(batch: pa.Table, _dim=dim) -> pa.Table:
        mat = _emb_matrix(batch, col).astype(np.float64)
        milli = np.floor(mat * float(scale)).astype(np.int64)
        if milli.size == 0:
            milli = milli.reshape(0, _dim)
        elif milli.shape[1] != _dim:
            raise ValueError(
                f"perceptron_milli: ragged embedding dim "
                f"{milli.shape[1]} != {_dim}"
            )
        labels = batch[label_col].to_numpy().astype(np.int64)
        y = np.where(labels == target_label, 1, -1).astype(np.int64)
        return pa.table(
            {
                "vid": batch[id_col].cast(pa.int64()),
                "label": pa.array(labels),
                "y": pa.array(y),
                "m": pa.FixedSizeListArray.from_arrays(
                    pa.array(milli.reshape(-1), pa.int64()), _dim
                ),
            }
        )

    # Materialized once: the ``iters + 1`` passes re-read the compact
    # int64 matrix, not the source parquet (the standard cached-working-
    # set trade of any iterative trainer; drop the materialize to trade
    # a re-read per pass instead).
    q = ds.map_batches(
        quantize, batch_format="pyarrow", batch_size=None
    ).materialize()

    w = np.zeros(dim, dtype=np.int64)

    # True global max|m| (one row per block) so the int64 dot-product
    # guard holds for any embedding value range, not just unit-norm.
    def block_max(batch: pa.Table) -> pa.Table:
        flat = (
            batch["m"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
        )
        mb = int(np.abs(flat).max()) if len(flat) else 0
        return pa.table({"mb": pa.array([mb], pa.int64())})

    max_m = max(
        (
            int(r["mb"])
            for r in q.map_batches(
                block_max, batch_format="pyarrow", batch_size=None
            ).take_all()
        ),
        default=0,
    ) or 1

    def _milli(batch: pa.Table) -> np.ndarray:
        return (
            batch["m"]
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(-1, dim)
            .astype(np.int64)
        )

    def _check_bound(wv: np.ndarray) -> None:
        wmax = int(np.abs(wv).max()) if wv.size else 0
        if wmax and dim * max_m * wmax >= _INT63:
            raise OverflowError(
                "perceptron_milli: |w·x| bound exceeds int64 "
                f"(dim={dim}, scale={scale}, max|w|={wmax}); "
                "lower scale or iters"
            )

    # In-process epochs when the quantized matrix fits one gather (the
    # budgeted-sum idiom): each distributed epoch is a dataset execution
    # + a dim-keyed exchange of pure fixed overhead at small n; the
    # per-epoch update Σ_mis y·m is a commutative int64 sum, so the
    # driver loop is bit-identical (forced-path pytest pins it).
    if q.count() * dim <= _CLS_GATHER_CELLS:
        from ._schema import concat_blocks

        qt = concat_blocks(
            q,
            pa.schema(
                [
                    ("vid", pa.int64()),
                    ("label", pa.int64()),
                    ("y", pa.int64()),
                    ("m", pa.list_(pa.int64(), dim)),
                ]
            ),
        )
        m_all = _milli(qt)
        y_all = qt["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        for _ in range(iters):
            _check_bound(w)
            s = m_all @ w
            mis = (y_all * s) <= 0
            if mis.any():
                w = w + (m_all[mis] * y_all[mis, None]).sum(
                    axis=0, dtype=np.int64
                )
        _check_bound(w)
        s = m_all @ w
        import ray.data as _rdm

        return _rdm.from_arrow(
            pa.table(
                {
                    "vec_id": qt["vid"],
                    "label": qt["label"],
                    "y": qt["y"],
                    "score": pa.array(s.astype(np.int64)),
                    "pred": pa.array(np.where(s > 0, 1, -1).astype(np.int64)),
                }
            )
        )

    for _ in range(iters):
        _check_bound(w)
        w_ref = _ray.put(w)

        def upd_partial(batch: pa.Table, _ref=w_ref) -> pa.Table:
            from .dedup import _get_broadcast

            wv = _get_broadcast(_ref)
            m = _milli(batch)
            y = batch["y"].to_numpy().astype(np.int64)
            s = m @ wv  # exact: guarded above
            mis = (y * s) <= 0
            if not mis.any():
                return pa.table(
                    {
                        "dim": pa.array([], pa.int64()),
                        "u": pa.array([], pa.int64()),
                    }
                )
            u = (m[mis] * y[mis, None]).sum(axis=0, dtype=np.int64)
            return pa.table(
                {
                    "dim": pa.array(np.arange(dim, dtype=np.int64)),
                    "u": pa.array(u),
                }
            )

        rows = (
            q.map_batches(
                upd_partial, batch_format="pyarrow", batch_size=None
            )
            .groupby("dim")
            .aggregate(Sum("u", alias_name="u"))
            .take_all()
        )  # ≤ dim rows: the only driver-side state per pass
        for r in rows:
            w[int(r["dim"])] += int(r["u"])

    # Guard the scoring pass too: the last update may have grown w past
    # the dot-product bound even though every training pass was safe.
    _check_bound(w)
    w_ref = _ray.put(w)

    def score(batch: pa.Table, _ref=w_ref) -> pa.Table:
        from .dedup import _get_broadcast

        wv = _get_broadcast(_ref)
        m = _milli(batch)
        s = m @ wv
        return pa.table(
            {
                "vec_id": batch["vid"],
                "label": batch["label"],
                "y": batch["y"],
                "score": pa.array(s.astype(np.int64)),
                "pred": pa.array(
                    np.where(s > 0, 1, -1).astype(np.int64)
                ),
            }
        )

    return q.map_batches(score, batch_format="pyarrow", batch_size=None)


def _rd_empty():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "label": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
                "pred": pa.array([], pa.int64()),
            }
        )
    )
