"""The coarse-to-fine inverse-compositional Lucas-Kanade aligner.

TPU-native re-design of the reference's VideoAligner (alignment.cpp:149-704):
the *entire* per-frame alignment — pyramid build, keyframe precompute,
warp-diff outlier rejection, Hessian + regularized inverse, and the
Gauss-Newton iteration loop at every pyramid level — is ONE jitted XLA
program per resolution. There are zero host round trips inside a frame
(the reference re-enters host code between every kernel: nth_element,
cv::SVD, 4x4 solves — SURVEY.md §7 "hard parts").

Structural mapping:
  - level count / shapes / tile sizes  -> static Python (trace-time
    specialization; the analog of the reference's 10 AOT argmax variants)
  - alternating keyframe (alignment.hpp:61-66, KeyframeIndex=1) -> pyramid
    state carries both buffers as a leading axis of 2; keyframe precompute
    runs under lax.cond(curr == 1)
  - nth_element 80% selection (alignment.cpp:460-492) -> 0/1 mask via
    quantile threshold (dense) or exact-count top_k (parity mode)
  - GN loop with corner-displacement convergence (alignment.cpp:600-668)
    -> lax.while_loop, all on device
  - early-return failure semantics (max_iters: alignment.cpp:661-667;
    per-level displacement: alignment.cpp:670-677) -> transform frozen at
    the failure point via masking, identical to the value the reference
    would have returned

Capture envelope (shared with the reference by construction): the scheme
evaluates keyframe gradients at the *unwarped* keypoint coordinates
(generators.cpp:346-385), so the GN direction is only correct while the
gradient autocorrelation C(d) stays positive at the full per-level
displacement d. On natural (1/f-spectrum) imagery that bounds reliable
capture to roughly ±2^(levels-1) px of inter-frame motion (~±32px at
1080p); beyond it the GN either fails max_iters or converges to a small
spurious transform — exactly as the reference does. phase_correlate=True
extends the envelope for fast pans (alignment.cpp:369-388).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.config import AlignerParams, pyramid_shapes, tile_size_for
from video_stabilizer_tpu.ops import (
    grad_argmax,
    grad_xy,
    pyr_down,
    sparse_jacobian,
    take_at_tile_argmax,
)
from video_stabilizer_tpu.ops.linalg import regularized_pinv_sym4
from video_stabilizer_tpu.ops.patches import (
    extract_tile_windows_flat,
    sample_windows_flat,
    warp_rel_positions_flat,
    window_origins_flat,
    window_size,
)
from video_stabilizer_tpu.ops.phase_corr import phase_correlate
from video_stabilizer_tpu.ops.select import histogram_mask, topk_mask

# Alternating keyframe constants (alignment.hpp:61-66).
KEYFRAME_INDEX = 1
NON_KEYFRAME_INDEX = 0
PHASE_LEVEL = 2  # alignment.hpp:69


@dataclasses.dataclass(frozen=True)
class LevelSpec:
    """Static geometry of one pyramid level."""
    width: int
    height: int
    tile: int
    wt: int       # tiles across
    ht: int       # tiles down
    margin: int   # sampling-window margin (ops/patches.py)


def level_specs(width: int, height: int, params: AlignerParams) -> Tuple[LevelSpec, ...]:
    """Static per-level geometry for a resolution (alignment.cpp:155-204)."""
    shapes = pyramid_shapes(width, height, params)
    n = len(shapes)
    specs = []
    for lvl, (w, h) in enumerate(shapes):
        t = tile_size_for(w, h)
        # Coarsest two levels absorb the bulk motion -> full margin; finer
        # levels refine sub-pixel -> slim windows.
        m = params.window_margin if lvl >= n - 2 else params.window_margin_fine
        specs.append(LevelSpec(w, h, t, w // t, h // t, m))
    return tuple(specs)


class DynAlignParams(NamedTuple):
    """The aligner's dynamic (traced) parameters: sweepable with vmap over
    hyperparameter combos with zero recompiles (the TPU-native replacement
    for the reference's thread-pool grid search, grid_search_align.cpp:159-210).
    """
    threshold: jnp.ndarray            # GN step convergence (px)
    smallest_fraction: jnp.ndarray    # keypoint keep fraction
    max_displacement: jnp.ndarray     # per-level failure bound (px)


def make_dyn_params(params: AlignerParams, dtype=jnp.float32) -> DynAlignParams:
    return DynAlignParams(
        threshold=jnp.asarray(params.threshold, dtype),
        smallest_fraction=jnp.asarray(params.smallest_fraction, dtype),
        max_displacement=jnp.asarray(params.max_displacement, dtype),
    )


class LevelKeyData(NamedTuple):
    """Per-level keyframe precompute (alignment.cpp:237-276), plus the
    pre-extracted sampling windows (the TPU-native replacement for the
    per-iteration random-access reads of the keyframe — ops/patches.py).

    Hot-loop arrays use the FLAT layout: the tile grid (N = Ht*Wt) on the
    minor axis, X/Y keypoint sets stacked on a leading axis of 2."""
    idx_x: jnp.ndarray     # (ht, wt) int32 flat within-tile argmax, X set
    idx_y: jnp.ndarray
    coords: jnp.ndarray    # (2 xy, 2 sets, N) float32 keypoint coordinates
    jac: jnp.ndarray       # (4, 2 sets, N) float Jacobian rows
    windows: jnp.ndarray   # (P, P, N) keyframe windows — u8 storage (exact),
                           # bf16 on levels the Pallas GN kernel consumes


class AlignerState(NamedTuple):
    """Carried aligner state (pytree). Axis 0 of each pyramid level is the
    double buffer: index 0 = non-keyframe, 1 = keyframe (alignment.hpp:62-66)."""
    pyramid: Tuple[jnp.ndarray, ...]   # per level (2, h, w) uint8
    key: Tuple[LevelKeyData, ...]
    curr_idx: jnp.ndarray              # () int32: which buffer holds frame t
    frames_seen: jnp.ndarray           # () int32, saturates at 2


def init_state(width: int, height: int, params: AlignerParams) -> AlignerState:
    specs = level_specs(width, height, params)
    dtype = jnp.dtype(params.dtype)
    pyramid = tuple(
        jnp.zeros((2, s.height, s.width), jnp.uint8) for s in specs)
    key = tuple(
        LevelKeyData(
            idx_x=jnp.zeros((s.ht, s.wt), jnp.int32),
            idx_y=jnp.zeros((s.ht, s.wt), jnp.int32),
            coords=jnp.zeros((2, 2, s.ht * s.wt), jnp.float32),
            jac=jnp.zeros((4, 2, s.ht * s.wt), dtype),
            windows=jnp.zeros(
                (window_size(s.tile, s.margin),
                 window_size(s.tile, s.margin),
                 s.ht * s.wt), _window_store_dtype(params, s)),
        ) for s in specs)
    return AlignerState(
        pyramid=pyramid,
        key=key,
        curr_idx=jnp.zeros((), jnp.int32),
        frames_seen=jnp.zeros((), jnp.int32),
    )


def _compute_keyframe(key_imgs, specs, params) -> Tuple[LevelKeyData, ...]:
    """GradXY -> GradArgMax -> SparseJacobian per level (alignment.cpp:237-276)."""
    dtype = jnp.dtype(params.dtype)
    out = []
    for img, s in zip(key_imgs, specs):
        gx, gy = grad_xy(img, dtype=dtype)
        idx_x, coords_x, idx_y, coords_y = grad_argmax(gx, gy, s.tile)
        gval = take_at_tile_argmax(jnp.stack([gx, gy]),
                                   jnp.stack([idx_x, idx_y]), s.tile)
        gval_x, gval_y = gval[0], gval[1]
        # Jacobian rows built DIRECTLY in the flat (4, set, N) hot-loop
        # layout (generators.cpp:332-423 semantics — see ops/sparse.py's
        # grid-layout twin): stacking per-row avoids a hostile [4*2*N]
        # transpose that cost ~0.6ms/level on TPU.
        n = s.ht * s.wt
        cx_l, cy_l = s.width * 0.5, s.height * 0.5
        scale = 1.0 / s.width
        gx_f = (2.0 * gval_x.reshape(n)).astype(dtype)
        gy_f = (2.0 * gval_y.reshape(n)).astype(dtype)
        ux = coords_x[..., 0].reshape(n).astype(dtype) - cx_l
        vx = coords_x[..., 1].reshape(n).astype(dtype) - cy_l
        uy = coords_y[..., 0].reshape(n).astype(dtype) - cx_l
        vy = coords_y[..., 1].reshape(n).astype(dtype) - cy_l
        zero = jnp.zeros((n,), dtype)
        jac = jnp.stack([
            jnp.stack([gx_f * ux * scale, gy_f * vy * scale]),
            jnp.stack([gx_f * (-vx) * scale, gy_f * uy * scale]),
            jnp.stack([gx_f, zero]),
            jnp.stack([zero, gy_f]),
        ])                                                    # (4, set, N)
        coords = jnp.stack([
            jnp.stack([ux + cx_l, uy + cx_l]),
            jnp.stack([vx + cy_l, vy + cy_l]),
        ])                                                    # (xy, set, N)
        windows = extract_tile_windows_flat(
            img, s.tile, s.margin, out_dtype=_window_store_dtype(params, s))
        out.append(LevelKeyData(idx_x, idx_y, coords, jac, windows))
    return tuple(out)


def _selection_mask(wd, params: AlignerParams, dyn: DynAlignParams):
    """The smallest-`smallest_fraction` keypoint subset as a 0/1 mask.

    Replaces nth_element + resize (alignment.cpp:460-492). "mask" uses the
    integer-binned histogram threshold (reference-like u16 binning, ties
    kept — ops/select.py) with a TRACED fraction; "topk" keeps exactly
    floor(N * fraction) elements like the reference (static fraction).
    """
    if params.selection == "topk":
        return topk_mask(wd, params.smallest_fraction)
    return histogram_mask(wd, dyn.smallest_fraction)


def _gn_corners(spec, dtype):
    """The GN convergence corners use the (w-1, h-1) extent
    (alignment.cpp:590-593), unlike maxCornerDisplacement's (w, h)."""
    w = spec.width - 1.0
    h = spec.height - 1.0
    return jnp.asarray([[0.0, 0.0], [w, 0.0], [0.0, h], [w, h]], dtype)


# GN iterations unrolled per while_loop step: cuts the sequential loop
# depth 6x (convergence is still checked after every iteration — updates
# past convergence are masked out, so semantics match the reference's
# per-iteration break exactly; at most CHUNK-1 masked iterations of extra
# flops, which are nearly free on the VPU — the loop cost is dominated by
# per-op dispatch latency at the coarse levels).
GN_CHUNK = 6


def gn_chunk_for(p: int, n: int) -> int:
    """Per-level unroll width of the XLA GN while_loop body.

    Masked past-convergence iterations are free at the small coarse levels
    (dispatch-latency-bound) but NOT at levels with multi-MB windows: each
    masked iteration there re-reads the full (P, P, N) windows for nothing.
    A census on the benchmark content (fixed-chunk=1 run) measured true
    convergence at 1-4 iterations per level — with a 6-wide unroll the
    finest level ran 6 full ICA passes where 1 sufficed. 2-wide at big
    levels bounds the waste at one masked pass while keeping the worst-case
    (max_iters) trip count reasonable. Results are identical for any width:
    the masked updates don't change the carried transform."""
    return 2 if p * p * n * 2 >= 2 * 1024 * 1024 else GN_CHUNK


def _gn_level_uses_pallas(params: AlignerParams, p: int, n: int) -> bool:
    """Static decision: run this level's GN loop in the Pallas in-VMEM
    kernel? (geometry-based so the window STORAGE dtype can be chosen to
    match the consumer — see ``_window_store_dtype``).

    The kernel was built for levels where the XLA loop is HBM-bound (big
    windows re-read per iteration), but once windows are STORED u8 the
    re-read halves and the XLA loop's cross-stream fusion wins at every
    measured level size (round-4 A/B, BASELINE.md), so the default floor
    (AlignerParams.gn_min_bytes) is now the disabled sentinel — "auto"
    resolves to the XLA loop everywhere; set VIDSTAB_GN_MIN_BYTES to
    re-enable the size-floor hybrid for experiments. The floor
    is counted as-if-bf16; whether a level FITS uses the kernel's actual
    VMEM operand dtype (bf16, or u8 for levels like 4K L0 where only the
    half-size u8 form fits — pallas_gn.pallas_window_vmem_dtype)."""
    from video_stabilizer_tpu.ops.pallas_gn import pallas_window_vmem_dtype

    if params.gn_kernel == "xla" or params.fixed_iters is not None:
        return False
    fits = pallas_window_vmem_dtype(p, n) is not None
    if params.gn_kernel == "pallas":
        return fits
    return (fits and p * p * n * 2 >= params.gn_min_bytes
            and jax.default_backend() == "tpu")


def _use_pallas_gn(params: AlignerParams, windows) -> bool:
    return _gn_level_uses_pallas(params, windows.shape[0], windows.shape[-1])


def _window_store_dtype(params: AlignerParams, spec: LevelSpec):
    """HBM storage dtype of a level's sampling windows: the Pallas GN
    kernel's VMEM operand dtype where that kernel consumes the level (bf16,
    or u8 for levels that only fit VMEM as u8), u8 everywhere else (u8
    values are exact; ``sample_windows_flat`` upcasts in-register, so the
    XLA loop's bf16 products are bit-identical at half the HBM traffic)."""
    from video_stabilizer_tpu.ops.pallas_gn import pallas_window_vmem_dtype

    p = window_size(spec.tile, spec.margin)
    n = spec.ht * spec.wt
    if _gn_level_uses_pallas(params, p, n):
        return pallas_window_vmem_dtype(p, n)
    return jnp.uint8


def _align_level(spec: LevelSpec, key: LevelKeyData, template_img,
                 transform, params: AlignerParams, dyn: DynAlignParams):
    """One pyramid level: warpdiff selection, Hessian, GN while_loop.

    The keyframe image itself is not needed here: every keyframe read the
    GN loop performs goes through the pre-extracted sampling windows in
    ``key.windows`` (ops/patches.py).

    Returns (transform_out, level_failed). transform_out is pre-upscale on
    failure (matching the reference's early return) and TX/TY-doubled on
    success for levels > 0 (alignment.cpp:683-687).

    The X- and Y-gradient keypoint sets are stacked on a leading axis of 2
    so every sampling/reduction is one fused op over both sets.
    """
    dtype = jnp.dtype(params.dtype)
    w, h = spec.width, spec.height
    cx, cy = w * 0.5, h * 0.5
    n = spec.ht * spec.wt

    # Template intensities at the keyframe's argmax coords — a per-tile
    # take_along_axis, not a gather (see ops/argmax.py); both sets in one
    # stacked read.
    tmpl = take_at_tile_argmax(
        template_img, jnp.stack([key.idx_x, key.idx_y]),
        spec.tile).reshape(2, n).astype(dtype)             # (2, N)
    fx = key.coords[0]                                 # (2, N)
    fy = key.coords[1]
    jac = key.jac                                      # (4, 2, N)
    p = key.windows.shape[0]

    ox, oy = window_origins_flat(spec.ht, spec.wt, spec.tile, spec.margin)

    # Warp-diff robustness signal at the incoming transform
    # (alignment.cpp:409-431; center convention W*0.5, imgproc.cpp:100-103).
    t_ul0 = T.center_to_ul(transform, w, h, minus_one=False)
    rel_x0, rel_y0 = warp_rel_positions_flat(fx, fy, t_ul0, ox, oy, p)
    wd = jnp.abs(sample_windows_flat(key.windows, rel_x0, rel_y0) - tmpl)
    mask = jnp.stack([
        _selection_mask(wd[0], params, dyn),
        _selection_mask(wd[1], params, dyn)]).astype(dtype)  # (2, N)

    # Gauss-Newton Hessian over both selected sets (alignment.cpp:278-332,
    # 548-551) and its regularized inverse — both on device. All 16 entries
    # in ONE broadcast-multiply-reduce: separate to-scalar reductions cost
    # ~35us fixed latency each on TPU (measured: 0.58ms per Hessian), and a
    # 4x4-output dot_general lowers with degenerate layouts.
    jm = jac * mask                                    # (4, 2, N)
    H = jnp.sum(jm[:, None] * jac[None, :], axis=(2, 3))
    Hinv = regularized_pinv_sym4(H)

    # ICA's X/Y-set average (generators.cpp:595) folded into the mask.
    jac_masked = jac * (mask * 0.5)                    # (4, 2, N)

    # Pallas in-VMEM GN path (ops/pallas_gn.py): the whole while_loop in one
    # kernel with the windows VMEM-resident. Same math, same failure
    # semantics; falls back to the XLA loop off-TPU ("auto") or when the
    # level's windows exceed the VMEM budget.
    if _use_pallas_gn(params, key.windows):
        from video_stabilizer_tpu.ops.pallas_gn import (
            gn_solve_pallas, pallas_window_vmem_dtype)

        vmem_dtype = pallas_window_vmem_dtype(p, n)
        corners_static = ((0.0, 0.0), (w - 1.0, 0.0), (0.0, h - 1.0),
                          (w - 1.0, h - 1.0))
        t_final, converged, disp01, iters = gn_solve_pallas(
            key.windows.astype(vmem_dtype), tmpl, jac_masked, Hinv,
            fx, fy, ox, oy,
            transform.astype(jnp.float32), dyn.threshold,
            width=w, height=h, max_iters=params.max_iters,
            corners=corners_static)
        t_final = t_final.astype(dtype)
        level_failed = jnp.logical_or(
            jnp.logical_not(converged),
            disp01.astype(dtype) > dyn.max_displacement)
        t_up = t_final * jnp.asarray([1.0, 1.0, 2.0, 2.0], dtype)
        return t_final, t_up, level_failed, iters

    corners = _gn_corners(spec, dtype)
    corners0 = T.warp_points_center(transform, corners, cx, cy)
    jac_scale = jnp.asarray(1.0 / w, dtype)  # undo 1/width rows (alignment.cpp:627-635)

    def ica_rhs(t):
        t_ul = T.center_to_ul(t, w, h, minus_one=False)
        rel_x, rel_y = warp_rel_positions_flat(fx, fy, t_ul, ox, oy, p)
        warped = sample_windows_flat(key.windows, rel_x, rel_y)
        residual = tmpl - warped
        return jnp.sum(jac_masked * residual[None], axis=(1, 2))

    # Fixed-iteration mode (latency extension): exactly K iterations as a
    # static unroll — no while_loop, so the streaming path's sequential
    # dispatch depth collapses. converged := the LAST step moved corners
    # less than the threshold (the same signal the reference's loop would
    # check next).
    if params.fixed_iters is not None:
        t = transform
        prev_corners = corners0
        disp12 = jnp.zeros((), dtype)
        for _ in range(params.fixed_iters):
            b = ica_rhs(t)
            dt = Hinv @ b
            delta = jnp.stack([dt[0] * jac_scale, dt[1] * jac_scale,
                               dt[2], dt[3]])
            t = T.compose(delta, t)
            new_corners = T.warp_points_center(t, corners, cx, cy)
            disp12 = jnp.max(
                jnp.linalg.norm(new_corners - prev_corners, axis=-1))
            prev_corners = new_corners
        converged = disp12 < dyn.threshold
        disp01 = jnp.max(jnp.linalg.norm(prev_corners - corners0, axis=-1))
        level_failed = jnp.logical_or(
            jnp.logical_not(converged), disp01 > dyn.max_displacement)
        t_up = t * jnp.asarray([1.0, 1.0, 2.0, 2.0], dtype)
        return t, t_up, level_failed, jnp.asarray(params.fixed_iters,
                                                  jnp.int32)

    chunk = gn_chunk_for(p, n)

    def gn_cond(carry):
        _, _, it, _, converged = carry
        return jnp.logical_and(jnp.logical_not(converged), it < params.max_iters)

    def gn_body(carry):
        t, prev_corners, it, it_true, conv = carry
        for j in range(chunk):
            b = ica_rhs(t)
            dt = Hinv @ b
            delta = jnp.stack([dt[0] * jac_scale, dt[1] * jac_scale,
                               dt[2], dt[3]])
            t_new = T.compose(delta, t)  # delta first (alignment.cpp:639)
            new_corners = T.warp_points_center(t_new, corners, cx, cy)
            disp12 = jnp.max(
                jnp.linalg.norm(new_corners - prev_corners, axis=-1))
            do = jnp.logical_and(jnp.logical_not(conv),
                                 it + j < params.max_iters)
            t = jnp.where(do, t_new, t)
            prev_corners = jnp.where(do, new_corners, prev_corners)
            conv = jnp.logical_or(
                conv, jnp.logical_and(do, disp12 < dyn.threshold))
            # True executed-iteration count: the chunk counter `it` rounds
            # up to the unroll width, but `iters` must mean the same thing
            # on every backend (the Pallas kernel counts exactly).
            it_true = it_true + do.astype(jnp.int32)
        return (t, prev_corners, it + chunk, it_true, conv)

    t_final, corners1, _, iters, converged = jax.lax.while_loop(
        gn_cond, gn_body,
        (transform, corners0, jnp.zeros((), jnp.int32),
         jnp.zeros((), jnp.int32), jnp.zeros((), bool)))

    # Failure 1: max_iters without convergence (alignment.cpp:661-667).
    # Failure 2: total level displacement > max_displacement (670-677).
    disp01 = jnp.max(jnp.linalg.norm(corners1 - corners0, axis=-1))
    level_failed = jnp.logical_or(
        jnp.logical_not(converged), disp01 > dyn.max_displacement)

    # TX/TY double when moving up a level (alignment.cpp:683-687); the caller
    # applies it only on success and only for levels > 0.
    t_up = t_final * jnp.asarray([1.0, 1.0, 2.0, 2.0], dtype)
    return t_final, t_up, level_failed, iters


def phase_init_pair(img_prev, img_curr, num_levels, params, dtype,
                    is_keyframe):
    """Phase-correlation TX/TY init from two phase-level images
    (alignment.cpp:369-388). ``is_keyframe`` may be a traced bool.

    The scale factor is the reference's (1<<PhaseLevel)/(1<<PyramidLevels)
    (alignment.cpp:380) — note the denominator is 2^L, not 2^(L-1), i.e. an
    implicit extra 0.5 damping; replicated as-is.
    """
    lvl = min(PHASE_LEVEL, num_levels - 1)
    shift, response = phase_correlate(img_prev.astype(jnp.float32),
                                      img_curr.astype(jnp.float32))
    scale = (1 << lvl) / float(1 << num_levels)
    # Sign flip on keyframes (alignment.cpp:383-386).
    flip = jnp.where(is_keyframe, -1.0, 1.0)
    ok = response > params.phase_correlate_threshold
    zero = jnp.zeros((), jnp.float32)
    t = jnp.stack([zero, zero, shift[0] * scale * flip,
                   shift[1] * scale * flip]).astype(dtype)
    return jnp.where(ok, t, T.identity(dtype))


def _phase_init(state_pyramid, curr, specs, params, dtype):
    """Streaming-state wrapper for phase_init_pair."""
    num_levels = len(specs)
    lvl = min(PHASE_LEVEL, num_levels - 1)
    prev = 1 - curr
    return phase_init_pair(state_pyramid[lvl][prev], state_pyramid[lvl][curr],
                           num_levels, params, dtype,
                           curr == KEYFRAME_INDEX)


def _align_levels_merged(specs, key, template_pyr, k: int, transform,
                         params: AlignerParams, dyn: DynAlignParams):
    """Run the k COARSEST levels' GN programs as ONE while_loop over
    zero-padded union buffers (the latency extension behind
    AlignerParams.merge_coarse; reference level loop: alignment.cpp:390-688).

    The coarse levels' GN iterations are dispatch-latency-bound, not
    compute-bound, so collapsing their per-level while_loops (plus the
    between-loop warpdiff/selection/Hessian preludes) into a single loop
    cuts the sequential program depth of the streaming path. The carried
    level index walks coarsest -> finest; level entry work runs under
    ``lax.cond(it == 0)``.

    Exact-equivalence argument vs the unmerged path:
      - padded window taps carry Lanczos weight EXACTLY 0 (ops/lanczos.py
        zeroes |x| >= 2 and positions are clamped to the REAL per-level
        window interior, so every padded tap sits >= 2 away);
      - padded keypoint lanes have zero Jacobian rows -> exact zero
        Hessian / ICA-RHS contributions;
      - padded warp-diffs are forced into the histogram overflow bin and
        the keep target uses the real count (histogram_mask n_valid), so
        the selection threshold is computed over exactly the real lanes.
    The only deviation is f32 reduction order across the padded lanes
    (~1e-6 relative), bounded by tests/test_merged_levels.py.
    """
    dtype = jnp.dtype(params.dtype)
    order = [len(specs) - 1 - i for i in range(k)]   # coarsest first
    pm = max(key[l].windows.shape[0] for l in order)
    nm = max(specs[l].ht * specs[l].wt for l in order)

    wins_l, tmpl_l, fx_l, fy_l, jac_l = [], [], [], [], []
    ox_l, oy_l, valid_l, corners_l, consts_l = [], [], [], [], []
    for l in order:
        s, kd = specs[l], key[l]
        n = s.ht * s.wt
        p = kd.windows.shape[0]
        dn, dp = nm - n, pm - p
        tmpl = take_at_tile_argmax(
            template_pyr[l], jnp.stack([kd.idx_x, kd.idx_y]),
            s.tile).reshape(2, n).astype(dtype)
        wins_l.append(jnp.pad(kd.windows, ((0, dp), (0, dp), (0, dn))))
        tmpl_l.append(jnp.pad(tmpl, ((0, 0), (0, dn))))
        fx_l.append(jnp.pad(kd.coords[0].astype(dtype), ((0, 0), (0, dn))))
        fy_l.append(jnp.pad(kd.coords[1].astype(dtype), ((0, 0), (0, dn))))
        jac_l.append(jnp.pad(kd.jac, ((0, 0), (0, 0), (0, dn))))
        ox, oy = window_origins_flat(s.ht, s.wt, s.tile, s.margin)
        ox_l.append(jnp.pad(ox, (0, dn)))
        oy_l.append(jnp.pad(oy, (0, dn)))
        valid_l.append((jnp.arange(nm) < n).astype(dtype))
        corners_l.append(_gn_corners(s, dtype))
        consts_l.append((float(s.width), float(s.height),
                         float(p) - 3.0 - 1e-3, float(n), 1.0 / s.width))
    wins_st = jnp.stack(wins_l)            # (k, Pm, Pm, Nm) u8
    tmpl_st = jnp.stack(tmpl_l)            # (k, 2, Nm)
    fx_st = jnp.stack(fx_l)
    fy_st = jnp.stack(fy_l)
    jac_st = jnp.stack(jac_l)              # (k, 4, 2, Nm)
    ox_st = jnp.stack(ox_l)                # (k, Nm)
    oy_st = jnp.stack(oy_l)
    valid_st = jnp.stack(valid_l)          # (k, Nm)
    corners_st = jnp.stack(corners_l)      # (k, 4, 2)
    consts_st = jnp.asarray(consts_l, dtype)   # (k, 5)

    thr = dyn.threshold
    max_iters = params.max_iters
    upscale = jnp.asarray([1.0, 1.0, 2.0, 2.0], dtype)

    def body(carry):
        (i, t_comm, t_work, failed, it, conv, mask, hinv, c0, pc) = carry
        wins_i = wins_st[i]
        tmpl_i = tmpl_st[i]
        fx_i, fy_i = fx_st[i], fy_st[i]
        jac_i = jac_st[i]
        ox_i, oy_i = ox_st[i], oy_st[i]
        corners_i = corners_st[i]
        w_i, h_i, relhi_i, nreal_i, jacscale_i = (
            consts_st[i, 0], consts_st[i, 1], consts_st[i, 2],
            consts_st[i, 3], consts_st[i, 4])
        cx_i, cy_i = w_i * 0.5, h_i * 0.5

        def rel_positions(t):
            t_ul = T.center_to_ul(t, w_i, h_i, minus_one=False)
            a, b, tx, ty = t_ul[0], t_ul[1], t_ul[2], t_ul[3]
            wx = (1.0 + a) * fx_i - b * fy_i + tx
            wy = b * fx_i + (1.0 + a) * fy_i + ty
            return (jnp.clip(wx - ox_i, 2.0, relhi_i),
                    jnp.clip(wy - oy_i, 2.0, relhi_i))

        def entry(_):
            # Level prelude at the committed transform: warpdiff selection,
            # Hessian + regularized inverse, corner baselines (the work
            # _align_level does outside its while_loop).
            t0 = t_comm
            rel_x0, rel_y0 = rel_positions(t0)
            wd = jnp.abs(sample_windows_flat(wins_i, rel_x0, rel_y0)
                         - tmpl_i)
            wd = jnp.where(valid_st[i] > 0, wd, 1e9)
            m = jnp.stack([
                histogram_mask(wd[0], dyn.smallest_fraction,
                               n_valid=nreal_i),
                histogram_mask(wd[1], dyn.smallest_fraction,
                               n_valid=nreal_i)]).astype(dtype)
            jm = jac_i * m
            H = jnp.sum(jm[:, None] * jac_i[None, :], axis=(2, 3))
            c00 = T.warp_points_center(t0, corners_i, cx_i, cy_i)
            return t0, m, regularized_pinv_sym4(H), c00, c00

        t, mask, hinv, c0, pc = jax.lax.cond(
            it == 0, entry, lambda _: (t_work, mask, hinv, c0, pc), None)
        jacm = jac_i * (mask * 0.5)

        prev_corners, conv_l = pc, conv
        for j in range(GN_CHUNK):
            rel_x, rel_y = rel_positions(t)
            warped = sample_windows_flat(wins_i, rel_x, rel_y)
            b = jnp.sum(jacm * (tmpl_i - warped)[None], axis=(1, 2))
            dt = hinv @ b
            delta = jnp.stack([dt[0] * jacscale_i, dt[1] * jacscale_i,
                               dt[2], dt[3]])
            t_new = T.compose(delta, t)
            new_c = T.warp_points_center(t_new, corners_i, cx_i, cy_i)
            disp12 = jnp.max(jnp.linalg.norm(new_c - prev_corners, axis=-1))
            do = jnp.logical_and(jnp.logical_not(conv_l),
                                 it + j < max_iters)
            t = jnp.where(do, t_new, t)
            prev_corners = jnp.where(do, new_c, prev_corners)
            conv_l = jnp.logical_or(
                conv_l, jnp.logical_and(do, disp12 < thr))
        it_next = it + GN_CHUNK
        level_done = jnp.logical_or(conv_l, it_next >= max_iters)

        # Level exit: failure checks + TX/TY upscale (alignment.cpp:661-687;
        # every merged level is > 0, so the upscale always applies on
        # success), with the committed transform frozen once failed.
        disp01 = jnp.max(jnp.linalg.norm(prev_corners - c0, axis=-1))
        level_failed = jnp.logical_or(jnp.logical_not(conv_l),
                                      disp01 > dyn.max_displacement)
        t_next = jnp.where(level_failed, t, t * upscale)
        t_comm2 = jnp.where(
            level_done, jnp.where(failed, t_comm, t_next), t_comm)
        failed2 = jnp.logical_or(
            failed, jnp.logical_and(level_done, level_failed))

        i2 = jnp.where(level_done, i + 1, i)
        it2 = jnp.where(level_done, 0, it_next)
        conv2 = jnp.logical_and(jnp.logical_not(level_done), conv_l)
        return (i2, t_comm2, t, failed2, it2, conv2, mask, hinv, c0,
                prev_corners)

    init = (jnp.zeros((), jnp.int32), transform, transform,
            jnp.zeros((), bool), jnp.zeros((), jnp.int32),
            jnp.zeros((), bool), jnp.zeros((2, nm), dtype),
            jnp.zeros((4, 4), dtype), jnp.zeros((4, 2), dtype),
            jnp.zeros((4, 2), dtype))
    out = jax.lax.while_loop(lambda c: c[0] < k, body, init)
    return out[1], out[3]


def align_all_levels(template_pyr, key, specs,
                     params: AlignerParams, t_init, dyn: DynAlignParams = None):
    """The coarse-to-fine level loop (alignment.cpp:390-688), statically
    unrolled. Shared by the streaming and batched pipelines.

    The keyframe enters only through ``key``: all keyframe pixel reads go
    through the pre-extracted sampling windows (LevelKeyData.windows).

    Args:
      template_pyr: sequence of per-level (h, w) u8 images.
      key: per-level LevelKeyData for the keyframe.
      t_init: (4,) initial transform (identity or phase-correlation init).

    Returns:
      (transform, failed): the *pre-inversion* transform, frozen at the
      failure point like the reference's early returns.
    """
    if dyn is None:
        dyn = make_dyn_params(params, jnp.dtype(params.dtype))
    transform = t_init
    failed = jnp.zeros((), bool)
    start = len(specs) - 1
    km = min(params.merge_coarse, len(specs) - 1)
    if (km >= 2 and params.selection == "mask"
            and params.fixed_iters is None
            and params.gn_kernel != "pallas"):
        transform, failed = _align_levels_merged(
            specs, key, template_pyr, km, transform, params, dyn)
        start = len(specs) - 1 - km
    for lvl in range(start, -1, -1):
        t_raw, t_up, level_failed, _ = _align_level(
            specs[lvl], key[lvl], template_pyr[lvl], transform, params, dyn)
        t_next = jnp.where(level_failed, t_raw, t_up) if lvl > 0 else t_raw
        transform = jnp.where(failed, transform, t_next)
        failed = jnp.logical_or(failed, level_failed)
    return transform, failed


@functools.partial(jax.jit, static_argnames=("params", "width", "height"))
def _align_next_frame_impl(state: AlignerState, gray, params: AlignerParams,
                           width: int, height: int):
    specs = level_specs(width, height, params)
    num_levels = len(specs)
    dtype = jnp.dtype(params.dtype)

    # Buffer flip (alignment.cpp:158-159, 206-207): first frame -> buffer 0.
    curr = jnp.where(state.frames_seen == 0, 0, 1 - state.curr_idx).astype(jnp.int32)

    # Pyramid build for the current frame (alignment.cpp:217-223).
    levels = [gray]
    for _ in range(num_levels - 1):
        levels.append(pyr_down(levels[-1]))
    pyramid = tuple(
        buf.at[curr].set(lvl) for buf, lvl in zip(state.pyramid, levels))

    ready = state.frames_seen + 1 >= 2  # alignment.cpp:231-234

    # Keyframe precompute on keyframe frames (alignment.cpp:357-367).
    def compute_key(_):
        return _compute_keyframe(
            tuple(p[KEYFRAME_INDEX] for p in pyramid), specs, params)

    key = jax.lax.cond(curr == KEYFRAME_INDEX, compute_key,
                       lambda _: state.key, operand=None)

    # Initial transform: identity, or phase-correlation TX/TY.
    if params.phase_correlate:
        transform = _phase_init(pyramid, curr, specs, params, dtype)
    else:
        transform = T.identity(dtype)

    # Coarse-to-fine level loop, statically unrolled (alignment.cpp:390-688).
    transform, failed = align_all_levels(
        tuple(p[NON_KEYFRAME_INDEX] for p in pyramid),
        key, specs, params, transform)

    # Non-keyframe frames report the inverse (alignment.cpp:690-693); the
    # early-return failure paths skip the inversion.
    inverted = T.inverse(transform)
    transform = jnp.where(
        jnp.logical_and(curr != KEYFRAME_INDEX, jnp.logical_not(failed)),
        inverted, transform)

    success = jnp.logical_and(ready, jnp.logical_not(failed))
    transform = jnp.where(ready, transform, T.identity(dtype))

    new_state = AlignerState(
        pyramid=pyramid,
        key=key,
        curr_idx=curr,
        frames_seen=jnp.minimum(state.frames_seen + 1, 2),
    )
    return new_state, transform, success


def align_next_frame(state: AlignerState, gray, params: AlignerParams):
    """Align one grayscale frame against the alternating keyframe.

    Args:
      state: AlignerState for this resolution (init_state).
      gray: (H, W) uint8 frame.
      params: static AlignerParams.

    Returns:
      (new_state, transform (4,), success ()): ``transform`` measures motion
      from the previous frame to this one; ``success`` is False for the first
      frame and on track loss (reference returns bool the same way).
    """
    h, w = gray.shape[-2], gray.shape[-1]
    return _align_next_frame_impl(state, gray, params, w, h)


class VideoAligner:
    """Stateful convenience wrapper mirroring the reference's VideoAligner
    class API (alignment.hpp:51-58). Re-inits state on resolution change
    (alignment.cpp:155)."""

    def __init__(self, params: AlignerParams = AlignerParams()):
        self.params = params
        self._state = None
        self._shape = None

    def align_next_frame(self, gray):
        """gray: (H, W) uint8 numpy/JAX array -> (transform (4,), success bool)."""
        shape = (gray.shape[-2], gray.shape[-1])
        if self._state is None or shape != self._shape:
            self._state = init_state(shape[1], shape[0], self.params)
            self._shape = shape
        self._state, t, ok = align_next_frame(
            self._state, jnp.asarray(gray), self.params)
        return t, ok

    def reset(self):
        self._state = None
        self._shape = None
