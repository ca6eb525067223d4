"""Pins the two documented deviations from the reference and the f32
numerics at production scale (VERDICT round-2 items 8-9):

1. selection modes: the default histogram mask (ties kept) vs the exact-
   count topk (nth_element parity, alignment.cpp:460-492) converge to the
   same transforms on the golden fixture, bounded at the GN solver's own
   convergence-precision class;
2. window-interior position clamping (ops/patches.py:198-204) vs the
   reference's per-tap image-border clamping (generators.cpp:490-492):
   identical inside the capture envelope, divergence confined to clamped
   positions beyond it (which the outlier rejection discards);
3. f32 tree-reduction accumulation of the ICA RHS and Hessian vs f64 at
   1080p-scale keypoint counts (the reference accumulates in double,
   generators.cpp:445, alignment.cpp:284).
"""

import numpy as np
import jax.numpy as jnp

from video_stabilizer_tpu import ops
from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.config import AlignerParams, tile_size_for
from video_stabilizer_tpu.models.batch import align_clip
from video_stabilizer_tpu.ops.patches import (
    clamp_rel,
    extract_tile_windows_flat,
    sample_windows_flat,
    window_origins_flat,
    window_size,
)
from video_stabilizer_tpu.utils.io import synth_shaky_clip
from conftest import natural_image


# ------------------------------------------------------------------ item 1

def _max_corner_delta(t_a, t_b, w, h):
    corners = jnp.asarray([[0.0, 0.0], [w - 1.0, 0.0], [0.0, h - 1.0],
                           [w - 1.0, h - 1.0]], jnp.float32)
    pa = np.asarray(T.warp_points_center(jnp.asarray(t_a), corners,
                                         w * 0.5, h * 0.5))
    pb = np.asarray(T.warp_points_center(jnp.asarray(t_b), corners,
                                         w * 0.5, h * 0.5))
    return float(np.linalg.norm(pa - pb, axis=-1).max())


def test_selection_modes_converge_to_same_transforms():
    """mask vs topk on the golden fixture clip. The GN stop criterion is a
    0.02 px *step* bound, so each mode independently lands within ~0.2 px
    of the fixed point; the inter-mode delta must sit inside that same
    convergence-precision class (measured: max 0.16 px at the default
    threshold, shrinking with threshold — i.e. the difference is solver
    slack, not a selection-semantics divergence)."""
    spec = dict(num_frames=24, height=144, width=192, seed=777,
                jitter_px=1.0, pan_px_per_frame=0.3,
                rot_jitter=0.002, zoom_jitter=0.001, color=False)
    frames = synth_shaky_clip(**spec)
    w, h = spec["width"], spec["height"]
    m_mask, ok_mask = align_clip(frames, AlignerParams())
    m_topk, ok_topk = align_clip(frames, AlignerParams(selection="topk"))
    np.testing.assert_array_equal(np.asarray(ok_mask), np.asarray(ok_topk))
    deltas = [_max_corner_delta(a, b, w, h)
              for a, b in zip(np.asarray(m_mask), np.asarray(m_topk))]
    assert max(deltas) < 0.25, (max(deltas), deltas)
    assert float(np.median(deltas)) < 0.1, deltas

    # Run the solver to tight convergence: the inter-mode delta collapses
    # to < 0.06 px (measured 0.048), proving the default-threshold spread
    # is GN stopping slack, not a selection-semantics divergence.
    tight_mask = AlignerParams(threshold=0.002, max_iters=128)
    tight_topk = AlignerParams(threshold=0.002, max_iters=128,
                               selection="topk")
    m_mask_t, _ = align_clip(frames, tight_mask)
    m_topk_t, _ = align_clip(frames, tight_topk)
    deltas_t = [_max_corner_delta(a, b, w, h)
                for a, b in zip(np.asarray(m_mask_t), np.asarray(m_topk_t))]
    assert max(deltas_t) < 0.06, (max(deltas_t), deltas_t)


# ------------------------------------------------------------------ item 2

def test_border_clamp_equivalence_inside_envelope():
    """For displacements within the window envelope (|d| <= margin - 2),
    the window path's edge-padded windows reproduce the reference's
    per-tap border clamping EXACTLY (min/max tap clamping == edge
    replication), so window samples == gather-oracle samples even for
    keypoints in border tiles."""
    h, w, tile, margin = 96, 128, 8, 12
    img = jnp.asarray(natural_image(h, w, seed=9))
    p = window_size(tile, margin)
    windows = extract_tile_windows_flat(img, tile, margin)
    ht, wt = h // tile, w // tile
    ox, oy = window_origins_flat(ht, wt, tile, margin)

    # Keypoints at the top-left pixel of every tile (worst case for negative
    # displacement), incl. all four border rows/cols of tiles.
    ys, xs = np.meshgrid(np.arange(ht) * tile, np.arange(wt) * tile,
                         indexing="ij")
    fx = jnp.asarray(xs.reshape(-1), jnp.float32)
    fy = jnp.asarray(ys.reshape(-1), jnp.float32)
    coords = jnp.stack([fx, fy], axis=-1).astype(jnp.int32)

    for dx, dy in [(-10.0, 0.0), (10.0, -9.0), (0.0, 9.5), (-9.5, -9.5)]:
        t_ul = jnp.asarray([0.0, 0.0, dx, dy], jnp.float32)
        rel_x = clamp_rel(fx + dx - ox, p)
        rel_y = clamp_rel(fy + dy - oy, p)
        got = np.asarray(sample_windows_flat(windows, rel_x, rel_y))
        oracle = np.asarray(ops.sparse_warp_sample(img, coords, t_ul))
        # bf16 window storage rounds u8 exactly; the bf16 weight products
        # lose <1 intensity RMS per sample (max ~2) vs the f32 gather
        # oracle — far below the >2 median divergence of the clamped
        # (beyond-envelope) regime in the next test.
        diff = np.abs(got - oracle)
        assert diff.max() <= 2.5, (dx, dy, diff.max())
        assert np.sqrt(np.mean(diff ** 2)) < 0.8, (dx, dy)


def test_border_clamp_divergence_confined_beyond_envelope():
    """The constructed disagreeing case: displacement BEYOND margin - 2.
    The window path clamps the position (samples the wrong place); the
    reference clamps taps (samples the true place). Pin the invariant that
    makes the deviation safe: divergence occurs ONLY at clamped positions,
    and at those positions the warp-diff robustness signal is large, so
    the smallest-80% outlier rejection discards them."""
    h, w, tile, margin = 96, 128, 8, 12
    img = jnp.asarray(natural_image(h, w, seed=9))
    p = window_size(tile, margin)
    windows = extract_tile_windows_flat(img, tile, margin)
    ht, wt = h // tile, w // tile
    ox, oy = window_origins_flat(ht, wt, tile, margin)

    ys, xs = np.meshgrid(np.arange(ht) * tile, np.arange(wt) * tile,
                         indexing="ij")
    fx = jnp.asarray(xs.reshape(-1), jnp.float32)
    fy = jnp.asarray(ys.reshape(-1), jnp.float32)
    coords = jnp.stack([fx, fy], axis=-1).astype(jnp.int32)
    tmpl = np.asarray(img)[ys.reshape(-1), xs.reshape(-1)].astype(np.float64)

    dx, dy = -15.0, 4.0   # beyond the (margin-2)=10 px envelope in x
    t_ul = jnp.asarray([0.0, 0.0, dx, dy], jnp.float32)
    raw_x = fx + dx - ox
    raw_y = fy + dy - oy
    clamped = np.asarray((raw_x < 2.0) | (raw_x > p - 3.0 - 1e-3)
                         | (raw_y < 2.0) | (raw_y > p - 3.0 - 1e-3))
    assert clamped.all()  # every point's position clamps at this shift

    got = np.asarray(sample_windows_flat(
        windows, clamp_rel(raw_x, p), clamp_rel(raw_y, p)), np.float64)
    oracle = np.asarray(ops.sparse_warp_sample(img, coords, t_ul),
                        np.float64)
    div = np.abs(got - oracle)
    # The divergence is real (the sampled position moved by 5 px)...
    assert div.max() > 2.0
    # ...but bounded by the intensity range (both paths sample real pixels).
    assert div.max() <= 255.0
    # Safety invariant: the warp-diff signal that drives selection is large
    # at the clamped points — a 5 px position error on natural texture
    # produces diffs far above the inlier class, so the reference-parity
    # outlier rejection (smallest 80%) discards these points in the same
    # regime where the reference's tap-clamped samples are themselves
    # border-degenerate.
    wd_window = np.abs(got - tmpl)
    assert np.median(wd_window) > 4.0, np.median(wd_window)

    # Control: the SAME geometry inside the envelope has zero clamping and
    # sub-LSB divergence.
    t_in = jnp.asarray([0.0, 0.0, -9.0, 4.0], jnp.float32)
    rel_x = fx - 9.0 - ox
    rel_y = fy + 4.0 - oy
    assert not np.asarray((rel_x < 2.0) | (rel_x > p - 3.0 - 1e-3)).any()
    got_in = np.asarray(sample_windows_flat(
        windows, clamp_rel(rel_x, p), clamp_rel(rel_y, p)))
    oracle_in = np.asarray(ops.sparse_warp_sample(img, coords, t_in))
    assert np.abs(got_in - oracle_in).max() <= 1.0


# ------------------------------------------------------------------ item 3

def _keyframe_arrays_1080p():
    """Real L0 aligner arrays at 1080p scale: tile 20 -> 96*54 = 5184
    keypoints per set (the actual production N the f32 reductions face)."""
    h, w = 1080, 1920
    tile = tile_size_for(w, h)
    assert tile == 20 and (w // tile) * (h // tile) == 5184
    img = jnp.asarray(natural_image(h, w, seed=31))
    gx, gy = ops.grad_xy(img)
    idx_x, coords_x, idx_y, coords_y = ops.grad_argmax(gx, gy, tile)
    gval_x = ops.take_at_tile_argmax(gx, idx_x, tile)
    gval_y = ops.take_at_tile_argmax(gy, idx_y, tile)
    jac_x, jac_y = ops.sparse_jacobian(gval_x, gval_y, coords_x, coords_y,
                                       w, h)
    tmpl_x = ops.take_at_tile_argmax(img, idx_x, tile)
    tmpl_y = ops.take_at_tile_argmax(img, idx_y, tile)
    return img, coords_x, coords_y, jac_x, jac_y, tmpl_x, tmpl_y, w, h


def test_ica_rhs_f32_accumulation_at_1080p_scale():
    """f32 tree-reduction of the ICA RHS vs f64 accumulation of the SAME
    per-point contributions at N = 5184 (isolates accumulation error from
    the lanczos-polynomial difference). Budget: |err| <= depth * eps_f32 *
    sum|contrib| with depth = log2(N) ~ 12.3 — in practice XLA's pairwise
    tree keeps it far below."""
    img, coords_x, coords_y, jac_x, jac_y, tmpl_x, tmpl_y, w, h = (
        _keyframe_arrays_1080p())
    t_center = T.make(0.002, -0.001, 1.3, -0.9)
    t_ul = T.center_to_ul(t_center, w, h, minus_one=False)

    b_f32 = np.asarray(ops.sparse_ica(
        tmpl_x, tmpl_y, img, coords_x, coords_y, jac_x, jac_y,
        jnp.ones(tmpl_x.shape, jnp.float32), jnp.ones(tmpl_y.shape,
                                                      jnp.float32), t_ul))

    # f64 accumulation of the identical f32 per-point contributions.
    def contribs(tmpl, coords, jac):
        warped = ops.sparse_warp_sample(img, coords, t_ul)   # f32, same fn
        res = tmpl.astype(jnp.float32) - warped
        return (np.asarray(jac, np.float64)
                * np.asarray(res, np.float64)[..., None])
    cx = contribs(tmpl_x, coords_x, jac_x).reshape(-1, 4)
    cy = contribs(tmpl_y, coords_y, jac_y).reshape(-1, 4)
    b_f64 = 0.5 * (cx.sum(axis=0) + cy.sum(axis=0))

    sum_abs = 0.5 * (np.abs(cx).sum(axis=0) + np.abs(cy).sum(axis=0))
    budget = np.log2(5184) * np.finfo(np.float32).eps * sum_abs
    err = np.abs(b_f32 - b_f64)
    assert np.all(err <= budget), (
        f"f32 ICA accumulation error {err} exceeds the "
        f"depth*eps*sum|contrib| budget {budget} at N=5184 "
        f"(sum|contrib|={sum_abs})")


def test_hessian_f32_accumulation_at_1080p_scale():
    """The 4x4 GN Hessian's f32 broadcast-multiply-reduce (the aligner's
    exact formulation, models/aligner.py:276-278) vs f64 at N = 5184, same
    depth * eps * sum|terms| budget; also pins that the relative error
    stays below 1e-5 (the reference's f64 Hessian feeds a Tikhonov-guarded
    SVD inverse — alignment.cpp:553-577 — so 1e-5 relative leaves 10+
    orders of headroom to the cond>1e6 guard)."""
    _, coords_x, coords_y, jac_x, jac_y, tmpl_x, tmpl_y, w, h = (
        _keyframe_arrays_1080p())
    n = tmpl_x.size
    jac = jnp.stack([jac_x.reshape(n, 4).T, jac_y.reshape(n, 4).T],
                    axis=1)                                  # (4, 2, N)
    jm = jac * jnp.ones((2, n), jnp.float32)
    h_f32 = np.asarray(jnp.sum(jm[:, None] * jac[None, :], axis=(2, 3)))

    jac64 = np.asarray(jac, np.float64)
    terms = jac64[:, None] * jac64[None, :]                  # (4, 4, 2, N)
    h_f64 = terms.sum(axis=(2, 3))
    sum_abs = np.abs(terms).sum(axis=(2, 3))
    budget = np.log2(2 * 5184) * np.finfo(np.float32).eps * sum_abs
    err = np.abs(h_f32 - h_f64)
    assert np.all(err <= budget), (
        f"f32 Hessian accumulation error\n{err}\nexceeds budget\n{budget}")
    rel = err / np.maximum(np.abs(h_f64), 1e-12)
    assert rel.max() < 1e-5, rel
