"""End-to-end aligner tests: synthetic-motion golden recovery.

Generalizes the reference's align_test strategy (align_test.cpp:358-400,
625-691): warp a textured frame by a known transform, run the aligner on the
pair, and assert the recovered transform matches the injected one — measured
in max corner displacement like the GN convergence test itself.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from video_stabilizer_tpu import AlignerParams
from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.models.aligner import (
    VideoAligner, init_state, align_next_frame, level_specs)
from video_stabilizer_tpu.ops import warp_image_bgr
from conftest import natural_image

H, W = 180, 240
PARAMS = AlignerParams()


def shifted_pair(img, t_center):
    """frame0 = img; frame1 = img warped so that content moves by t_center
    (motion frame0 -> frame1 = t_center)."""
    h, w = img.shape
    # Content moving by T means frame1(p) = frame0(T^-1(p)); sample at T^-1.
    t_ul = T.center_to_ul(jnp.asarray(t_center, jnp.float32), w, h,
                          minus_one=True)
    t_sample = T.inverse(t_ul)
    f1 = warp_image_bgr(jnp.asarray(img), t_sample, interp="lanczos2",
                        border="edge")
    return jnp.asarray(img), f1


def recover(img, t_center, params=PARAMS):
    f0, f1 = shifted_pair(img, t_center)
    aligner = VideoAligner(params)
    t, ok0 = aligner.align_next_frame(f0)
    assert not bool(ok0)  # first frame: no pair yet (alignment.cpp:231-234)
    t, ok1 = aligner.align_next_frame(f1)
    return np.asarray(t, np.float64), bool(ok1)


def corner_err(t_got, t_want):
    """Max corner displacement of got∘want⁻¹ — alignment error in pixels."""
    diff = T.compose(T.inverse(jnp.asarray(t_want, jnp.float32)),
                     jnp.asarray(t_got, jnp.float32))
    return float(T.max_corner_displacement(diff, W, H))


@pytest.mark.parametrize("t_want", [
    (0.0, 0.0, 2.0, 0.0),
    (0.0, 0.0, 0.0, -2.0),
    (0.0, 0.0, 3.5, 2.25),
    (0.004, 0.0, 0.0, 0.0),       # slight zoom
    (0.0, 0.005, 0.0, 0.0),       # slight rotation
    (0.002, -0.003, 1.5, -1.0),   # combined
])
def test_recover_injected_motion(t_want):
    img = natural_image(H, W, seed=42)
    got, ok = recover(img, np.asarray(t_want))
    assert ok, f"alignment failed for {t_want}"
    # Tolerance: the GN stop criterion is a 0.02px *step*; the converged
    # absolute error is ~10x that. The reference's own accuracy check uses
    # 0.5px (align_test.cpp:358-400).
    err = corner_err(got, np.asarray(t_want))
    assert err < 0.4, f"corner error {err:.3f}px for {t_want}, got {got}"


def test_static_video_is_identity():
    img = natural_image(H, W, seed=43)
    aligner = VideoAligner(PARAMS)
    aligner.align_next_frame(jnp.asarray(img))
    for _ in range(3):
        t, ok = aligner.align_next_frame(jnp.asarray(img))
        assert bool(ok)
        assert float(T.max_corner_displacement(t, W, H)) < 0.05


def test_alternating_keyframe_sign_consistency():
    # A constant drift must be reported with the same sign on keyframe and
    # non-keyframe frames (the inversion at alignment.cpp:690-693).
    img = natural_image(H + 40, W + 40, seed=44)
    drift = 1.5
    frames = []
    for k in range(5):
        ox = 10 + drift * k
        win = img[10 : 10 + H, int(ox) : int(ox) + W]
        frames.append(jnp.asarray(win))
    aligner = VideoAligner(PARAMS)
    measured = []
    for f in frames:
        t, ok = aligner.align_next_frame(f)
        if bool(ok):
            measured.append(float(np.asarray(t)[2]))
    assert len(measured) >= 3
    # The window pans right by 1.5px/frame, so the CONTENT moves left:
    # every measurement is a same-sign x-shift. The integer cropping of
    # this fixture quantizes each step to 1 or 2 px.
    for tx in measured:
        assert -2.3 < tx < -0.7, measured
    assert abs(np.mean(measured) + drift) < 0.3, measured


def test_out_of_envelope_motion_behaves_like_reference():
    # A displacement far beyond the LK capture envelope (~2^(levels-1) px;
    # see the aligner docstring). Like the reference, the GN loop may
    # "converge" to a small spurious transform (warpdiff selection keeps
    # the least-informative points, b -> 0, displacement check passes) —
    # a known false-positive failure mode of the reference design
    # (alignment.cpp:642-677 can't detect it). Pin down that behavior:
    # either a clean failure, or a finite small-motion report — never NaNs.
    img = natural_image(H, W, seed=45)
    big = (0.0, 0.0, 60.0, 45.0)
    got, ok = recover(img, np.asarray(big))
    assert np.all(np.isfinite(got))
    if ok:
        # Spurious "success": reported motion must at least be bounded by
        # max_displacement per level semantics.
        assert float(np.abs(got[2])) < 60.0


def test_flat_image_reports_identity():
    # Zero gradients -> H == 0 -> regularized pinv gives zero steps -> the
    # GN loop converges instantly to the identity and reports success.
    flat = np.full((H, W), 128, np.uint8)
    aligner = VideoAligner(PARAMS)
    aligner.align_next_frame(jnp.asarray(flat))
    t, ok = aligner.align_next_frame(jnp.asarray(flat))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-4)


def test_selection_topk_mode_matches_mask_mode_closely():
    img = natural_image(H, W, seed=46)
    t_want = np.asarray((0.0, 0.0, 2.0, 1.0))
    got_mask, ok1 = recover(img, t_want, AlignerParams(selection="mask"))
    got_topk, ok2 = recover(img, t_want, AlignerParams(selection="topk"))
    assert ok1 and ok2
    assert corner_err(got_mask, t_want) < 0.25
    assert corner_err(got_topk, t_want) < 0.25


def test_jit_cache_one_program_per_resolution():
    img = natural_image(H, W, seed=47)
    state = init_state(W, H, PARAMS)
    s1, t1, ok1 = align_next_frame(state, jnp.asarray(img), PARAMS)
    # Same shapes -> no retrace (check state pytree structure is stable).
    s2, t2, ok2 = align_next_frame(s1, jnp.asarray(img), PARAMS)
    assert jnp.asarray(t2).shape == (4,)
    import jax
    assert jax.tree.structure(s1) == jax.tree.structure(s2)


def test_level_specs_1080p():
    specs = level_specs(1920, 1080, PARAMS)
    assert len(specs) == 6
    assert (specs[0].width, specs[0].height, specs[0].tile) == (1920, 1080, 20)
    assert (specs[5].width, specs[5].height, specs[5].tile) == (60, 33, 2)
