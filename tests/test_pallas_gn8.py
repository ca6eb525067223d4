"""Pins the 8-DOF Pallas in-VMEM GN kernel (ops/pallas_gn.gn8_solve_pallas)
to the XLA while_loop it replaces (models/homography_aligner._align_level_h).
Runs in Pallas interpreter mode on CPU; the TPU A/B (the round-3 4K
profile's 24.5% fusion-soup lever, BASELINE.md) is measurement-gated on
hardware like the 4-DOF kernel was."""

import numpy as np
import jax.numpy as jnp

from video_stabilizer_tpu import homography as Hm
from video_stabilizer_tpu.config import AlignerParams, StabilizerParams
from video_stabilizer_tpu.models.homography_aligner import (
    align_clip_homography,
    stabilize_clip_homography,
)
from video_stabilizer_tpu.ops.fast_warp import warp_homography_fast
from video_stabilizer_tpu.utils.io import synth_shaky_clip
from conftest import natural_image

H, W = 180, 240

XLA = AlignerParams(gn_kernel="xla")
PALLAS = AlignerParams(gn_kernel="pallas")


def _corner_err(p_a, p_b):
    """Max warped-corner distance between two homographies (px) — the
    GN convergence-class metric (the loops differ only in f32 accumulation
    order, so converged results sit within ~one 0.02 px threshold step)."""
    corners = jnp.asarray([[8.0, 8.0], [W - 9.0, 8.0], [8.0, H - 9.0],
                           [W - 9.0, H - 9.0]])
    a = np.asarray(Hm.warp_points(jnp.asarray(p_a), corners, W, H))
    b = np.asarray(Hm.warp_points(jnp.asarray(p_b), corners, W, H))
    return np.max(np.hypot(*(a - b).T))


def test_injected_homography_recovery_matches_xla():
    img = natural_image(H, W, seed=50)
    p_true = jnp.asarray([0.002, -0.004, 1.5 / W, 0.003, 0.001, -1.0 / W,
                          0.004, -0.003], jnp.float32)
    f1 = warp_homography_fast(jnp.asarray(img), Hm.inverse(p_true),
                              interp="lanczos2", residual_bound=10)
    clip = np.stack([img, np.asarray(f1)])
    p_x, ok_x = align_clip_homography(clip, XLA)
    p_p, ok_p = align_clip_homography(clip, PALLAS)
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_p))
    assert bool(ok_p[1])
    assert _corner_err(p_x[1], p_p[1]) < 0.08


def test_clip_alignment_matches_xla():
    frames = synth_shaky_clip(10, 120, 160, seed=91, jitter_px=0.8,
                              pan_px_per_frame=0.3, rot_jitter=0.002,
                              color=False)
    p_x, ok_x = align_clip_homography(frames, XLA)
    p_p, ok_p = align_clip_homography(frames, PALLAS)
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_p))
    for t in range(frames.shape[0]):
        err = _corner_err(p_x[t], p_p[t])
        assert err < 0.08, (t, err)


def test_u8_vmem_windows_bit_identical():
    """u8 VMEM window storage (how the 40.5 MB 4K L0 windows fit the
    budget) upcasts in-register to the same bf16 values — the kernel's
    outputs must be BIT-identical to bf16 storage."""
    import jax
    from video_stabilizer_tpu.ops.pallas_gn import (
        gn8_solve_pallas, pallas_window_vmem_dtype)

    r = np.random.default_rng(7)
    p, n = 12, 256
    wins_u8 = jnp.asarray(r.integers(0, 256, (p, p, n)), jnp.uint8)
    tmpl = jnp.asarray(r.uniform(0, 255, (2, n)), jnp.float32)
    jacm = jnp.asarray(r.normal(0, 1, (8, 2, n)), jnp.float32)
    hinv = jnp.asarray(np.eye(8) * 1e-4, jnp.float32)
    u = jnp.asarray(r.uniform(-0.5, 0.5, (2, n)), jnp.float32)
    v = jnp.asarray(r.uniform(-0.3, 0.3, (2, n)), jnp.float32)
    ox = jnp.asarray(r.uniform(0, 10, (n,)), jnp.float32)
    oy = jnp.asarray(r.uniform(0, 10, (n,)), jnp.float32)
    p0 = jnp.zeros((8,), jnp.float32)
    kwargs = dict(tmpl=tmpl, jac_masked=jacm, hinv=hinv, u=u, v=v,
                  ox=ox, oy=oy, p_init=p0,
                  threshold=jnp.float32(1e-6),   # never converges -> 3 iters
                  width=160, height=120, max_iters=3, interpret=True)
    out_b = gn8_solve_pallas(wins_u8.astype(jnp.bfloat16), **kwargs)
    out_u = gn8_solve_pallas(wins_u8, **kwargs)
    for a, b in zip(jax.tree.leaves(out_b), jax.tree.leaves(out_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Policy: a level too big for bf16 but fitting as u8 selects u8 — the
    # 4K L0 shape (P=32, N=20736: 40.5 MB bf16 / 20.2 MB u8) is the level
    # this path exists for and must stay inside the derived cap.
    from video_stabilizer_tpu.ops.pallas_gn import MAX_WINDOW_BYTES
    assert 32 * 32 * 20736 <= MAX_WINDOW_BYTES          # 4K L0 as u8 fits
    assert 32 * 32 * 20736 * 2 > MAX_WINDOW_BYTES       # ... and bf16 doesn't
    assert pallas_window_vmem_dtype(32, 20736) == jnp.uint8
    assert pallas_window_vmem_dtype(32, 1024) == jnp.bfloat16
    assert pallas_window_vmem_dtype(64, 10 ** 6) is None


def test_e2e_stabilize_with_pallas_gn8():
    """Full 8-DOF pipeline with the Pallas GN backend: outputs match the
    XLA backend at u8 scale."""
    frames = synth_shaky_clip(12, 120, 160, seed=92, jitter_px=0.8,
                              pan_px_per_frame=0.3, rot_jitter=0.002)
    p_x = StabilizerParams(lag=4, smoother_memory=2, crop_pixels=8,
                           aligner=XLA)
    p_p = StabilizerParams(lag=4, smoother_memory=2, crop_pixels=8,
                           aligner=PALLAS)
    out_x, meas_x, ok_x = stabilize_clip_homography(frames, p_x)
    out_p, meas_p, ok_p = stabilize_clip_homography(frames, p_p)
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_p))
    diff = np.abs(np.asarray(out_x, np.int32) - np.asarray(out_p, np.int32))
    assert np.mean(diff <= 1) > 0.99, np.mean(diff <= 1)
