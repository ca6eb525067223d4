"""Golden measurement-trace regression (VERDICT round-1 item 7): a committed
(T, 4) aligner measurement trace + accumulator trace for a fixed seed/clip.
Catches slow numeric drift across refactors that the streaming-vs-batched
equivalence tests can't (those only detect divergence *between* paths).

Regenerate the fixture with ``python tests/golden/make_golden.py`` ONLY for
deliberate numeric-semantics changes; document the reason in the commit.

Reference analog: align_test's deterministic seeds (align_test.cpp:444-601).
"""

import importlib.util
import os

import numpy as np

_HERE = os.path.dirname(__file__)
GOLDEN = os.path.join(_HERE, "golden", "meas_trace_v1.npz")


def _load_make_golden():
    spec = importlib.util.spec_from_file_location(
        "make_golden", os.path.join(_HERE, "golden", "make_golden.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_measurement_trace_matches_golden():
    meas, ok, accums = _load_make_golden().compute()
    g = np.load(GOLDEN)

    np.testing.assert_array_equal(ok, g["ok"])
    # f32 pipeline vs the committed f64-rounded trace: tolerances sized to
    # catch any algorithmic change (TX/TY move in whole pixels, A/B in
    # ~1e-3 units on this clip) while riding out XLA reduction-order
    # wobble across versions (~1e-6 relative).
    np.testing.assert_allclose(meas[:, 2:], g["meas"][:, 2:], atol=2e-3,
                               err_msg="TX/TY trace drifted")
    np.testing.assert_allclose(meas[:, :2], g["meas"][:, :2], atol=2e-5,
                               err_msg="A/B trace drifted")
    np.testing.assert_allclose(accums[:, 2:], g["accums"][:, 2:], atol=4e-3)
    np.testing.assert_allclose(accums[:, :2], g["accums"][:, :2], atol=4e-5)


def test_golden_clip_has_rotational_content():
    g = np.load(GOLDEN)
    assert np.std(g["meas"][2:, 1]) > 5e-4  # B axis genuinely exercised
