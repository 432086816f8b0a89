"""Budget-gate tests for the dedup operators' driver-gather fallbacks."""

import numpy as np
import pyarrow as pa


def test_lsh_exact_verify_budget_gate_matches_driver_path(ray_session):
    """A dup-saturated corpus forced past the candidate-gather budget
    (gather_rows=1) must verify through the distributed exchange path
    and produce the exact pairs+jaccards of the driver gather path."""
    import pandas as pd
    import ray.data as rd

    from s2sphere_ray.functions.dedup import minhash_lsh_pairs

    rng = np.random.default_rng(3)
    base = [
        "the quick brown fox jumps over the lazy dog and runs away " * 2,
        "pack my box with five dozen liquor jugs tonight thank you " * 2,
    ]
    texts = []
    for i in range(120):
        t = base[i % 2].split()
        if i % 3 == 0:
            t[rng.integers(0, len(t))] = f"tok{i}"
        texts.append(" ".join(t))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(120, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )

    def run(**kw):
        return (
            minhash_lsh_pairs(
                rd.from_arrow(tbl).repartition(7),
                jaccard_threshold=0.8,
                **kw,
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    a = run()
    assert len(a) > 1000  # genuinely saturated
    pd.testing.assert_frame_equal(a, run(gather_rows=1))
