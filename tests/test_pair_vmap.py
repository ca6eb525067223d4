"""2-lane batched pair align (AlignerParams.pair_vmap) equivalence.

The pair step's two alignments — frame A against the carried keyframe,
frame B against its own new keyframe — share no data, so running them as
one 2-lane vmapped align program must produce the SAME measurements and
success flags as the sequential form: every GN while_loop body is
lane-masked (`do` flags), so a converged lane's state is frozen while the
other lane finishes, and each lane's per-iteration math is unchanged.
Reference analog: the two aligns per keyframe pair, alignment.cpp:690-693.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from video_stabilizer_tpu.config import AlignerParams, StabilizerParams
from video_stabilizer_tpu.models.aligner import level_specs
from video_stabilizer_tpu.models.batch import (
    align_clip,
    pair_lanes_vmap_ok,
    stabilize_clip,
)
from video_stabilizer_tpu.models.homography_aligner import (
    align_clip_homography,
)
from video_stabilizer_tpu.utils.io import synth_shaky_clip

H, W = 180, 240


@pytest.fixture(scope="module")
def clip():
    return synth_shaky_clip(16, H, W, seed=11, jitter_px=1.0, color=False)


@pytest.fixture(scope="module")
def clip_bgr():
    return synth_shaky_clip(16, H, W, seed=11, jitter_px=1.0)


def test_gate_logic():
    p_on = AlignerParams(pair_vmap=True)
    specs = level_specs(W, H, p_on)
    assert pair_lanes_vmap_ok(specs, p_on)
    assert not pair_lanes_vmap_ok(specs, AlignerParams(pair_vmap=False))
    assert not pair_lanes_vmap_ok(
        specs, AlignerParams(pair_vmap=True, merge_coarse=2))
    # Forcing the Pallas kernel at any level disables the lane vmap.
    assert not pair_lanes_vmap_ok(
        specs, AlignerParams(pair_vmap=True, gn_kernel="pallas"))


def test_similarity_measurements_match(clip):
    """Batched-vs-sequential results agree to within the GN stop criterion.

    The 2-lane batch changes f32 reduce shapes, whose ~1e-7 rounding wobble
    can flip a histogram-selection bin or a borderline convergence check —
    moving a converged transform by up to one final GN step. Both runs
    satisfy the same convergence contract; assert the DISAGREEMENT, as max
    corner displacement, stays under 1.5x the 0.02 px step threshold."""
    import video_stabilizer_tpu.transforms as T
    import jax.numpy as jnp

    t_seq, ok_seq = align_clip(clip, AlignerParams(pair_vmap=False))
    t_vm, ok_vm = align_clip(clip, AlignerParams(pair_vmap=True))
    np.testing.assert_array_equal(np.asarray(ok_seq), np.asarray(ok_vm))
    diff = T.compose(T.inverse(jnp.asarray(t_seq)), jnp.asarray(t_vm))
    disp = np.asarray(T.max_corner_displacement(diff, W, H))
    assert disp.max() < 0.03, f"max corner disagreement {disp.max():.4f}px"


def test_homography_measurements_match(clip):
    import video_stabilizer_tpu.homography as Hm
    import jax.numpy as jnp

    base = dict(phase_correlate=True)
    p_seq, ok_seq = align_clip_homography(
        clip, AlignerParams(pair_vmap=False, **base))
    p_vm, ok_vm = align_clip_homography(
        clip, AlignerParams(pair_vmap=True, **base))
    np.testing.assert_array_equal(np.asarray(ok_seq), np.asarray(ok_vm))
    corners = jnp.asarray([[0.0, 0.0], [W - 1.0, 0.0], [0.0, H - 1.0],
                           [W - 1.0, H - 1.0]], jnp.float32)
    c_seq = np.asarray(jax_warp_all(Hm, p_seq, corners))
    c_vm = np.asarray(jax_warp_all(Hm, p_vm, corners))
    disp = np.linalg.norm(c_seq - c_vm, axis=-1).max()
    assert disp < 0.03, f"max corner disagreement {disp:.4f}px"


def jax_warp_all(Hm, p_all, corners):
    import jax
    return jax.vmap(lambda p: Hm.warp_points(p, corners, float(W),
                                             float(H)))(jnp.asarray(p_all))


def test_full_stabilize_output_matches(clip_bgr):
    out_seq, _, _ = stabilize_clip(
        clip_bgr, StabilizerParams(
            crop_pixels=8, aligner=AlignerParams(pair_vmap=False)))
    out_vm, _, _ = stabilize_clip(
        clip_bgr, StabilizerParams(
            crop_pixels=8, aligner=AlignerParams(pair_vmap=True)))
    seq, vm = np.asarray(out_seq), np.asarray(out_vm)
    assert seq.shape == vm.shape
    # u8 outputs: the <=0.03 px measurement disagreement (see above) moves
    # interpolated values by a few LSB where gradients are steep; bound the
    # warp-visible effect rather than demanding bit equality.
    diff = np.abs(seq.astype(np.int32) - vm.astype(np.int32))
    assert (diff > 2).mean() < 0.01, f">2LSB frac {(diff > 2).mean():.4f}"
    assert diff.mean() < 0.5, f"mean LSB diff {diff.mean():.3f}"
