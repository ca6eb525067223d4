"""8-DOF homography alignment and stabilization (extended model family).

The reference's motion model is a 4-DOF similarity (imgproc.hpp:40-46); the
north-star configs additionally require a "full 8-DOF homography model with
phase-correlation init and Lanczos2 warp" (BASELINE.json config 4) — e.g.
for rolling, tilting, or perspective-heavy footage at 4K.

The machinery is shared with the similarity aligner: same pyramid, same
per-tile argmax keypoints with separate X/Y gradient sets, same
pre-extracted sampling windows and histogram outlier rejection; only the
parameterization changes — 8 parameters over centered width-normalized
coordinates (homography.py), an 8x8 Gauss-Newton system solved with the
same Jacobi-eigh regularized pseudo-inverse, and no per-level TX/TY
rescaling (normalized coordinates are resolution-invariant).

Unlike the similarity path, this model does NOT replicate the reference's
quirks (no 2x/0.5x implicit damping — textbook GN steps); it is an
extension, not a port surface.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from video_stabilizer_tpu import homography as Hm
from video_stabilizer_tpu.config import (
    AlignerParams, StabilizerParams, resolve_residual_bound)
from video_stabilizer_tpu.models.aligner import (
    LevelSpec,
    PHASE_LEVEL,
    _gn_level_uses_pallas,
    _selection_mask,
    gn_chunk_for,
    level_specs,
    make_dyn_params,
)
from video_stabilizer_tpu.models.batch import (
    _bgr_to_gray_batched,
    pair_lanes_vmap_ok,
    smooth_trajectory,
)
from video_stabilizer_tpu.ops import (
    build_pyramid,
    grad_argmax,
    grad_xy,
    take_at_tile_argmax,
)
from video_stabilizer_tpu.ops.fast_warp import warp_homography_fast
from video_stabilizer_tpu.ops.linalg import regularized_pinv_sym4
from video_stabilizer_tpu.ops.patches import (
    clamp_rel,
    extract_tile_windows_flat,
    sample_windows_flat,
    window_origins_flat,
)
from video_stabilizer_tpu.ops.phase_corr import phase_correlate


class LevelKeyDataH(NamedTuple):
    idx_x: jnp.ndarray
    idx_y: jnp.ndarray
    coords: jnp.ndarray   # (2 xy, 2 sets, N) float32 pixel coordinates
    jac: jnp.ndarray      # (8, 2 sets, N)
    windows: jnp.ndarray  # (P, P, N) u8, or bf16 where the level's GN loop
    #                       runs in the Pallas kernel (values exact either
    #                       way — same storage policy as the 4-DOF
    #                       aligner._window_store_dtype)


def _compute_keyframe_h(key_imgs, specs, params):
    dtype = jnp.dtype(params.dtype)
    out = []
    for img, s in zip(key_imgs, specs):
        gx, gy = grad_xy(img, dtype=dtype)
        idx_x, coords_x, idx_y, coords_y = grad_argmax(gx, gy, s.tile)
        gval = take_at_tile_argmax(jnp.stack([gx, gy]),
                                   jnp.stack([idx_x, idx_y]), s.tile)
        gval_x, gval_y = gval[0].reshape(-1), gval[1].reshape(-1)
        n = s.ht * s.wt
        w_l, h_l = float(s.width), float(s.height)

        fx = jnp.stack([coords_x[..., 0].reshape(n),
                        coords_y[..., 0].reshape(n)]).astype(jnp.float32)
        fy = jnp.stack([coords_x[..., 1].reshape(n),
                        coords_y[..., 1].reshape(n)]).astype(jnp.float32)
        # Normalized coords of the keypoints.
        u = (fx - w_l * 0.5) / w_l                      # (2, N)
        v = (fy - h_l * 0.5) / w_l
        # dr/dp = grad_px * width * dW_norm/dp; X-set uses only grad_x on
        # the u-row, Y-set only grad_y on the v-row (the reference's
        # axis-specific trick, README.md:5 / generators.cpp:363-385).
        ju, jv = Hm.jacobian_rows(u, v)                 # (2, N, 8)
        g = jnp.stack([gval_x, gval_y]).astype(dtype) * w_l  # (2, N)
        sel = jnp.stack([ju[0], jv[1]])                 # (2, N, 8)
        jac = (sel * g[..., None]).transpose(2, 0, 1)   # (8, 2, N)

        coords = jnp.stack([fx, fy])                    # (2 xy, 2 sets, N)
        psize = s.tile + 2 * s.margin
        if _gn_level_uses_pallas(params, psize, n):
            from video_stabilizer_tpu.ops.pallas_gn import (
                pallas_window_vmem_dtype)
            win_dtype = pallas_window_vmem_dtype(psize, n)
        else:
            win_dtype = jnp.uint8
        windows = extract_tile_windows_flat(img, s.tile, s.margin,
                                            out_dtype=win_dtype)
        out.append(LevelKeyDataH(idx_x, idx_y, coords, jac.astype(dtype),
                                 windows))
    return tuple(out)


def _warp_rel_h(p, fx, fy, spec, ox, oy, psize):
    """Homography-warped window-relative positions for flat coords."""
    w_l, h_l = float(spec.width), float(spec.height)
    uv = jnp.stack([(fx - w_l * 0.5) / w_l, (fy - h_l * 0.5) / w_l], -1)
    wp = Hm.warp_norm(p, uv)
    wx = wp[..., 0] * w_l + w_l * 0.5
    wy = wp[..., 1] * w_l + h_l * 0.5
    return clamp_rel(wx - ox, psize), clamp_rel(wy - oy, psize)


def _align_level_h(spec: LevelSpec, key: LevelKeyDataH, template_img,
                   p_in, params: AlignerParams, dyn):
    dtype = jnp.dtype(params.dtype)
    n = spec.ht * spec.wt
    tmpl = take_at_tile_argmax(
        template_img, jnp.stack([key.idx_x, key.idx_y]),
        spec.tile).reshape(2, n).astype(dtype)
    fx, fy = key.coords[0], key.coords[1]
    jac = key.jac                                       # (8, 2, N)
    psize = key.windows.shape[0]
    ox, oy = window_origins_flat(spec.ht, spec.wt, spec.tile, spec.margin)

    rel_x0, rel_y0 = _warp_rel_h(p_in, fx, fy, spec, ox, oy, psize)
    wd = jnp.abs(sample_windows_flat(key.windows, rel_x0, rel_y0) - tmpl)
    mask = jnp.stack([
        _selection_mask(wd[0], params, dyn),
        _selection_mask(wd[1], params, dyn)]).astype(dtype)

    jm = jac * mask
    # All 64 Hessian entries in one fused broadcast-multiply-reduce (see
    # the similarity aligner's note on to-scalar reduction latency).
    H = jnp.sum(jm[:, None] * jac[None, :], axis=(2, 3))
    Hinv = regularized_pinv_sym4(H)
    jac_masked = jac * mask

    w_l, h_l = float(spec.width), float(spec.height)

    # Pallas in-VMEM GN path (ops/pallas_gn.gn8_solve_pallas): the whole
    # 8-DOF while_loop in one kernel — removes both the per-level fusion
    # soup (the round-3 4K profile's 24.5% leaf-time cluster) and the
    # per-iteration HBM window re-reads. Same math, same failure semantics;
    # selection policy shared with the 4-DOF path (_gn_level_uses_pallas).
    if _gn_level_uses_pallas(params, psize, n):
        from video_stabilizer_tpu.ops.pallas_gn import (
            gn8_solve_pallas, pallas_window_vmem_dtype)

        u = (fx - w_l * 0.5) / w_l                      # (2, N) normalized
        v = (fy - h_l * 0.5) / w_l
        p_fin, conv, disp01, _ = gn8_solve_pallas(
            key.windows.astype(pallas_window_vmem_dtype(psize, n)),
            tmpl, jac_masked, Hinv,
            u, v, ox, oy, p_in.astype(jnp.float32), dyn.threshold,
            width=spec.width, height=spec.height, max_iters=params.max_iters)
        p_fin = p_fin.astype(dtype)
        failed = jnp.logical_or(
            jnp.logical_not(conv),
            disp01.astype(dtype) > dyn.max_displacement)
        return p_fin, failed

    corners = jnp.asarray([[0.0, 0.0], [w_l - 1, 0.0], [0.0, h_l - 1],
                           [w_l - 1, h_l - 1]], dtype)
    corners0 = Hm.warp_points(p_in, corners, w_l, h_l)

    def rhs(p):
        rel_x, rel_y = _warp_rel_h(p, fx, fy, spec, ox, oy, psize)
        warped = sample_windows_flat(key.windows, rel_x, rel_y)
        residual = tmpl - warped
        return jnp.sum(jac_masked * residual[None], axis=(1, 2))

    # Per-level unroll width: big-window levels bound masked-iteration
    # waste at one ICA pass (see aligner.gn_chunk_for — the full-window
    # re-read per masked iteration dominates at multi-MB levels, and the
    # 8-DOF path runs the XLA loop at EVERY level).
    chunk = gn_chunk_for(psize, n)

    def gn_cond(carry):
        _, _, it, conv = carry
        return jnp.logical_and(jnp.logical_not(conv), it < params.max_iters)

    def gn_body(carry):
        p, prev_c, it, conv = carry
        for j in range(chunk):
            dt = Hinv @ rhs(p)
            p_new = Hm.compose(dt, p)
            c_new = Hm.warp_points(p_new, corners, w_l, h_l)
            disp = jnp.max(jnp.linalg.norm(c_new - prev_c, axis=-1))
            do = jnp.logical_and(jnp.logical_not(conv),
                                 it + j < params.max_iters)
            p = jnp.where(do, p_new, p)
            prev_c = jnp.where(do, c_new, prev_c)
            conv = jnp.logical_or(conv,
                                  jnp.logical_and(do, disp < dyn.threshold))
        return (p, prev_c, it + chunk, conv)

    p_fin, c1, _, conv = jax.lax.while_loop(
        gn_cond, gn_body,
        (p_in, corners0, jnp.zeros((), jnp.int32), jnp.zeros((), bool)))
    disp01 = jnp.max(jnp.linalg.norm(c1 - corners0, axis=-1))
    failed = jnp.logical_or(jnp.logical_not(conv),
                            disp01 > dyn.max_displacement)
    return p_fin, failed


def align_all_levels_h(template_pyr, key, specs, params, p_init, dyn=None):
    """Coarse-to-fine over levels; the normalized parameterization carries
    unchanged between levels (no TX/TY doubling)."""
    if dyn is None:
        dyn = make_dyn_params(params, jnp.dtype(params.dtype))
    p = p_init
    failed = jnp.zeros((), bool)
    for lvl in range(len(specs) - 1, -1, -1):
        p_new, level_failed = _align_level_h(
            specs[lvl], key[lvl], template_pyr[lvl], p, params, dyn)
        p = jnp.where(jnp.logical_or(failed, level_failed), p, p_new)
        failed = jnp.logical_or(failed, level_failed)
    return p, failed


class _CarryH(NamedTuple):
    key_pyr: tuple
    key: tuple


def _pair_step_h(carry, xs, specs, params, dyn):
    frame_a, frame_b, pair_idx = xs
    dtype = jnp.dtype(params.dtype)
    num_levels = len(specs)
    lvl_p = min(PHASE_LEVEL, num_levels - 1)

    def phase_p(prev_img, curr_img, is_key):
        if not params.phase_correlate:
            return Hm.identity(dtype)
        shift, resp = phase_correlate(prev_img.astype(jnp.float32),
                                      curr_img.astype(jnp.float32))
        scale = (1 << lvl_p) / float(1 << num_levels)
        flip = jnp.where(is_key, -1.0, 1.0)
        # Full-res pixel shift -> normalized translation (p2, p5) = px/width.
        w0 = float(specs[0].width)
        p = jnp.zeros((8,), dtype)
        p = p.at[2].set(shift[0] * scale * flip / w0)
        p = p.at[5].set(shift[1] * scale * flip / w0)
        return jnp.where(resp > params.phase_correlate_threshold, p,
                         Hm.identity(dtype))

    pyr_a = tuple(build_pyramid(frame_a, num_levels))
    pyr_b = tuple(build_pyramid(frame_b, num_levels))
    key_b = _compute_keyframe_h(pyr_b, specs, params)
    p0a = phase_p(carry.key_pyr[lvl_p], pyr_a[lvl_p], False)
    p0b = phase_p(pyr_a[lvl_p], pyr_b[lvl_p], True)

    if pair_lanes_vmap_ok(specs, params):
        # Same 2-lane batched pair align as batch._align_pair_step: both
        # alignments read template pyr_a against independent keyframes.
        key2 = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                            carry.key, key_b)
        p2, failed2 = jax.vmap(
            lambda k, p0: align_all_levels_h(pyr_a, k, specs, params, p0,
                                             dyn))(key2,
                                                   jnp.stack([p0a, p0b]))
        p_a, failed_a = p2[0], failed2[0]
        p_b, failed_b = p2[1], failed2[1]
    else:
        p_a, failed_a = align_all_levels_h(pyr_a, carry.key, specs, params,
                                           p0a, dyn)
        p_b, failed_b = align_all_levels_h(pyr_a, key_b, specs, params,
                                           p0b, dyn)

    p_a = jnp.where(failed_a, p_a, Hm.inverse(p_a))
    ok_a = jnp.logical_and(pair_idx > 0, jnp.logical_not(failed_a))
    p_a = jnp.where(pair_idx > 0, p_a, Hm.identity(dtype))
    ok_b = jnp.logical_not(failed_b)

    return (_CarryH(pyr_b, key_b),
            (jnp.stack([p_a, p_b]), jnp.stack([ok_a, ok_b])))


def init_pair_carry_h(specs, params) -> _CarryH:
    """The zero pre-stream homography aligner carry."""
    zero_pyr = tuple(
        jnp.zeros((s.height, s.width), jnp.uint8) for s in specs)
    return _CarryH(key_pyr=zero_pyr,
                   key=_compute_keyframe_h(zero_pyr, specs, params))


def _align_pairs_scan_h(frames, specs, params, dyn, carry0: _CarryH,
                        pair_base):
    """Homography twin of batch._align_pairs_scan: scan keyframe pairs from
    an arbitrary carried state (pair_base gates warm-up masking)."""
    t_pad = frames.shape[0]
    assert t_pad % 2 == 0
    idx = pair_base + jnp.arange(t_pad // 2, dtype=jnp.int32)
    step = functools.partial(_pair_step_h, specs=specs, params=params,
                             dyn=dyn)
    carry, (p_pairs, ok_pairs) = jax.lax.scan(
        step, carry0, (frames[0::2], frames[1::2], idx))
    return carry, p_pairs.reshape(t_pad, 8), ok_pairs.reshape(t_pad)


def align_clip_homography_impl(frames, params, width, height, dyn=None):
    """(T, H, W) u8 -> ((T, 8) homographies, (T,) success)."""
    specs = level_specs(width, height, params)
    t_in = frames.shape[0]
    if t_in % 2:
        frames = jnp.concatenate([frames, frames[-1:]], axis=0)
    carry0 = init_pair_carry_h(specs, params)
    _, p_seq, ok_seq = _align_pairs_scan_h(
        frames, specs, params, dyn, carry0, jnp.zeros((), jnp.int32))
    return p_seq[:t_in], ok_seq[:t_in]


@functools.partial(jax.jit, static_argnames=("params", "width", "height"))
def _align_clip_h_jit(frames, params, width, height):
    return align_clip_homography_impl(frames, params, width, height)


def align_clip_homography(frames, params: AlignerParams = AlignerParams()):
    t, h, w = frames.shape
    return _align_clip_h_jit(jnp.asarray(frames), params, w, h)


# --------------------------------------------------------------------------
# Full homography stabilization (smoother + accumulate + projective warp).
# --------------------------------------------------------------------------

def accumulate_corrections_h(measurements, success, smoothed,
                             params: StabilizerParams, width, height):
    """Homography twin of batch.accumulate_corrections (stabilizer.cpp:32-88
    event order; decay multiplies all 8 parameters like the reference
    multiplies all 4)."""
    t_total = measurements.shape[0]
    lag = params.lag
    offset = lag - params.smoother_memory
    dtype = measurements.dtype
    min_disp = jnp.asarray(params.min_disp, dtype)
    max_disp = jnp.asarray(params.max_disp, dtype)
    min_decay = jnp.asarray(params.min_decay, dtype)
    max_decay = jnp.asarray(params.max_decay, dtype)

    def step(accum, i):
        accum = jnp.where(success[i], accum, jnp.zeros(8, dtype))
        m = i - lag

        def fold(acc):
            meas = measurements[m]
            if params.enable_smoother:
                sm = smoothed[jnp.minimum(m + offset, smoothed.shape[0] - 1)]
                jitter = Hm.compose(meas, Hm.inverse(sm))
            else:
                jitter = meas
            na = Hm.compose(acc, jitter)
            disp = Hm.max_corner_displacement(na, width, height)
            f = jnp.clip((disp - min_disp) / (max_disp - min_disp), 0.0, 1.0)
            decay = jnp.where(disp > max_disp, max_decay,
                              jnp.where(disp > min_disp,
                                        min_decay * (1 - f) + max_decay * f,
                                        min_decay))
            return na * decay

        accum = jnp.where(m >= 0, fold(accum), accum)
        return accum, accum

    _, accums = jax.lax.scan(step, jnp.zeros(8, dtype),
                             jnp.arange(t_total, dtype=jnp.int32))
    return accums[lag:]


def warp_delayed_homography(delayed, accums, params: StabilizerParams,
                            width, height):
    """Warp + crop delayed frames by (..., 8) homography corrections —
    Pallas tile-local-base kernel on TPU ("auto"/"pallas"), XLA field FIR
    otherwise (same selector contract as batch.warp_delayed)."""
    from video_stabilizer_tpu.models.batch import _warp_mode

    c = params.crop_pixels
    if _warp_mode(params) == "pallas":
        from video_stabilizer_tpu.ops.pallas_warp import warp_frames_pallas
        out = warp_frames_pallas(delayed, accums.astype(jnp.float32),
                                 interp=params.output_interp,
                                 model="homography")
    else:
        batch_shape = delayed.shape[:-3]
        flat_frames = delayed.reshape((-1,) + delayed.shape[-3:])
        flat_p = accums.reshape(-1, 8)
        rb = resolve_residual_bound(params, width, height)
        out = jax.lax.map(
            lambda a: warp_homography_fast(a[0], a[1],
                                           interp=params.output_interp,
                                           residual_bound=rb),
            (flat_frames, flat_p))
        out = out.reshape(batch_shape + out.shape[1:])
    if c > 0:
        out = out[..., c:-c, c:-c, :]
    return out


def stabilize_clip_homography_core(frames_bgr, params: StabilizerParams,
                                   width, height):
    """Align + smooth + accumulate (no warp) — vmappable over streams with
    the Pallas warp hoisted out, like batch.stabilize_clip_core."""
    if frames_bgr.shape[0] <= params.lag:
        raise ValueError("clip length must exceed lag")
    gray = _bgr_to_gray_batched(frames_bgr)
    meas, success = align_clip_homography_impl(gray, params.aligner,
                                               width, height)
    smoothed = smooth_trajectory(meas, params) if params.enable_smoother else meas
    accums = accumulate_corrections_h(meas, success, smoothed, params,
                                      width, height)
    delayed = frames_bgr[: frames_bgr.shape[0] - params.lag]
    return delayed, accums, meas, success


def stabilize_clip_homography_impl(frames_bgr, params: StabilizerParams,
                                   width, height):
    delayed, accums, meas, success = stabilize_clip_homography_core(
        frames_bgr, params, width, height)
    stabilized = warp_delayed_homography(delayed, accums, params,
                                         width, height)
    return stabilized, meas, success


@functools.partial(jax.jit, static_argnames=("params", "width", "height"))
def _stabilize_clip_h_jit(frames, params, width, height):
    return stabilize_clip_homography_impl(frames, params, width, height)


def stabilize_clip_homography(frames_bgr,
                              params: StabilizerParams = StabilizerParams()):
    """Full-pipeline 8-DOF stabilization of a (T, H, W, 3) u8 clip."""
    frames_bgr = jnp.asarray(frames_bgr)
    h, w = frames_bgr.shape[1], frames_bgr.shape[2]
    return _stabilize_clip_h_jit(frames_bgr, params, w, h)


@functools.partial(jax.jit, static_argnames=("params", "width", "height"))
def _stabilize_streams_h_jit(frames, params, width, height):
    delayed, accums, meas, success = jax.vmap(
        lambda f: stabilize_clip_homography_core(f, params, width, height)
    )(frames)
    out = warp_delayed_homography(delayed, accums, params, width, height)
    return out, meas, success


def stabilize_streams_homography(frames_bgr,
                                 params: StabilizerParams = StabilizerParams()):
    """Multi-stream 8-DOF batch: (S, T, H, W, 3) u8 -> (S, T - lag, ...)."""
    frames_bgr = jnp.asarray(frames_bgr)
    h, w = frames_bgr.shape[2], frames_bgr.shape[3]
    return _stabilize_streams_h_jit(frames_bgr, params, w, h)
