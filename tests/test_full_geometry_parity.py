"""Depth-40 numerics regression at the real geometry (slow tier).

Regenerates the deterministic 4B fairseq-naming state dict, converts it,
runs the JAX forward for all three branches + VL, and asserts cosine
>= 1-1e-3 against the committed torch-fixture golden
(tests/fixtures/full_geometry_golden.npz, produced once by
examples/full_geometry_parity.py generate).  This is the closest
available proxy for the BASELINE <=1e-3 drift criterion while the real
one-peace.pt checkpoint is unreachable (zero egress)."""

import importlib.util
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "full_geometry_parity.py")


def _load():
    spec = importlib.util.spec_from_file_location("full_geometry_parity",
                                                  EXAMPLES)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_depth40_drift_within_baseline_criterion():
    mod = _load()
    if not os.path.exists(mod.GOLDEN):
        pytest.skip("golden fixture not generated yet")
    report = mod.check(tol=1e-3)
    # all four branches within the drift criterion at depth 40
    assert set(report) == {"text", "image", "audio", "vl"}
    for k, c in report.items():
        assert c >= 1 - 1e-3, (k, c)
