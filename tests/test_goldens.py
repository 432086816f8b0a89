"""Self-golden regression gate: current kernels must reproduce the frozen
outputs in tests/fixtures/goldens.json exactly (FIXTURES.md strategy —
protects cell/cover/kNN/hash semantics across optimization rounds).
Regenerate via tools/make_goldens.py ONLY after an intentional change."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def goldens():
    path = os.path.join(os.path.dirname(__file__), "fixtures", "goldens.json")
    with open(path) as fh:
        return json.load(fh)


def test_goldens_match_current(goldens):
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tools.make_goldens import build

    current = build()
    for key in goldens:
        assert current[key] == goldens[key], f"golden drift in {key}"
    assert set(current) == set(goldens)
