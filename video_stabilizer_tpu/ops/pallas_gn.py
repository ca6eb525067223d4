"""Pallas in-VMEM Gauss-Newton solver: the ICA inner loop on-chip.

The aligner's throughput ceiling (profiled, docs/ROADMAP.md) is the GN
inner loop: every iteration of the XLA ``lax.while_loop`` re-reads the full
(P, P, N) keyframe sampling windows from HBM (10.6 MB at 1080p L0) to
compute one Lanczos2-weighted reduction — the loop is bandwidth-bound at
~1 roundtrip per iteration, and the recentered-window XLA attempt made it
worse (779 -> 576 fps, commit cd7daf1). This kernel restructures the loop
around the memory hierarchy instead:

  - the windows are DMA'd into VMEM ONCE per (frame, level) and stay
    resident for every GN iteration (the reference's sparse_ica schedule
    keeps per-pixel warps in registers the same way —
    schedules/sparse_ica.schedule.h:49-174);
  - the entire while_loop runs INSIDE the kernel with a pure-scalar carry
    (transform + corners + convergence flag), so per-iteration op dispatch
    disappears along with the HBM traffic;
  - the per-iteration compute is a fori_loop over the window's y-taps:
    (P, N) VPU multiply-reduces with N on the lane axis — the same
    flat-layout contraction as ops/patches.sample_windows_flat, same bf16
    product / f32 accumulate numerics (pinned by the golden trace and the
    equivalence tests in tests/test_pallas_gn.py).

Semantics replicate models/aligner._align_level's loop exactly, which in
turn replicates the reference GN iteration (alignment.cpp:600-668):
sparse_ica RHS (generators.cpp:429-640), dt = Hinv b, the 1/width
de-normalization (alignment.cpp:627-635), delta-first composition
(alignment.cpp:639), per-iteration corner-movement convergence
(alignment.cpp:642-659), max_iters + level-displacement failure.

Operand-shape contract: every input/output keeps its last two dims free of
the batch axis ((1, k) for small vectors, (1, 1) SMEM for scalars) so
jax.vmap over streams lowers through the Pallas batching rule (the grid
gains a leading stream axis; verified on hardware — see the round-3 notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_stabilizer_tpu.ops.lanczos import lanczos2

# Per-core VMEM the kernel is allowed to request, and the fixed scratch
# headroom for everything that is NOT the windows operand (the small
# (k, N) operands are < 0.5 MB at 1080p; the tap-loop's f32 weight
# intermediates are ~3x one (P, N) row pair; the rest is Mosaic working
# set — win + 48 MB is the empirically validated request that compiles
# and runs with the 10.6 MB 1080p windows on the v5e, whose physical
# per-core VMEM is well above this budget). MAX_WINDOW_BYTES is DERIVED
# from these so a window near the cap can never push the total request
# past the budget (advisor round-3 finding: two independent constants let
# the request and the cap drift apart). The 72 MB budget admits exactly
# the windows the shipped policy targets — up to the 20.2 MB u8 form of
# the 4K L0 level; the on-HW suite exercises that near-cap shape
# (test_tpu_hw.py::test_pallas_gn8_near_vmem_cap) so the budget is
# validated on hardware, not assumed.
VMEM_BUDGET_BYTES = 72 * 1024 * 1024
SCRATCH_BYTES = 48 * 1024 * 1024
# Only fit-in-VMEM levels take the Pallas path. The VMEM operand dtype is
# bf16 where that fits (1080p L0 windows are 10.1 MB) and u8 where only
# the half-size u8 form does (4K L0: 40.5 MB bf16 / 20.2 MB u8 — the
# in-register upcast is exact, see _tap_sample); levels too big even as u8
# fall back to the XLA loop.
MAX_WINDOW_BYTES = VMEM_BUDGET_BYTES - SCRATCH_BYTES


def pallas_window_vmem_dtype(p: int, n: int):
    """The VMEM storage dtype the GN kernel would use for (P, P, N)
    windows, or None when the level cannot take the Pallas path."""
    if p * p * n * 2 <= MAX_WINDOW_BYTES:
        return jnp.bfloat16
    if p * p * n <= MAX_WINDOW_BYTES:
        return jnp.uint8
    return None


def _warp_corner(a, b, tx, ty, x, y, cx, cy):
    """Scalar center-pivot corner warp (imgproc.cpp:401-411)."""
    u = x - cx
    v = y - cy
    return ((1.0 + a) * u - b * v + cx + tx,
            b * u + (1.0 + a) * v + cy + ty)


def _tap_sample(win_ref, rel_xs, rel_ys, p, n):
    """Weight-normalized Lanczos2 sampling of BOTH keypoint sets from the
    VMEM-resident windows: a y-tap fori over window rows — each (P, N) row
    is read ONCE and feeds both sets' contractions; the y-weight row is
    recomputed per tap (7 FMAs on (1, N)) to keep the body free of dynamic
    value indexing. Returns (nums, den), each a 2-list of (1, N) f32 with
    warped[s] = nums[s] / den[s] — the exact math of
    patches.sample_windows_flat (bf16 products, f32 accumulation).

    Windows may be VMEM-resident as bf16 OR u8 (u8 halves the VMEM
    footprint — how the 40.5 MB 4K L0 windows fit the budget; pixel
    values are exact integers <= 255, so the in-register u8 -> bf16
    upcast per row keeps the products bit-identical)."""
    f32 = jnp.float32
    taps = jax.lax.broadcasted_iota(jnp.int32, (p, n), 0).astype(f32)
    wx_b, den = [], []
    for s in range(2):
        wx_s = lanczos2(taps - rel_xs[s])           # (P, N) f32
        wy_s = lanczos2(taps - rel_ys[s])
        den.append(jnp.sum(wy_s, axis=0, keepdims=True)
                   * jnp.sum(wx_s, axis=0, keepdims=True))
        wx_b.append(wx_s.astype(jnp.bfloat16))

    def tap_row(iy, accs):
        row = win_ref[iy]                           # (P, N) bf16 or u8
        if row.dtype != jnp.bfloat16:
            # Mosaic rejects the direct u8 -> bf16 cast: hop through int32
            # (exact for pixel values <= 255, same trick as pallas_warp).
            row = row.astype(jnp.int32).astype(jnp.bfloat16)
        iyf = iy.astype(f32)
        new = []
        for s in range(2):
            wy_row = lanczos2(iyf - rel_ys[s])      # (1, N)
            prod = (row * wy_row.astype(jnp.bfloat16)) * wx_b[s]
            new.append(accs[s] + jnp.sum(prod.astype(f32), axis=0,
                                         keepdims=True))
        return tuple(new)

    nums = list(jax.lax.fori_loop(
        0, p, tap_row, (jnp.zeros((1, n), f32), jnp.zeros((1, n), f32))))
    return nums, den


def _gn_kernel(thr_ref, t0_ref, hinv_ref, win_ref, tmpl_ref, jacm_ref,
               fx_ref, fy_ref, oxy_ref, out_ref, *,
               p, n, max_iters, jac_scale, corners, cx, cy, body_mode):
    f32 = jnp.float32
    thr = thr_ref[0, 0]
    t0 = (t0_ref[0, 0], t0_ref[0, 1], t0_ref[0, 2], t0_ref[0, 3])
    hinv = [[hinv_ref[i, j] for j in range(4)] for i in range(4)]
    rel_lo = jnp.asarray(2.0, f32)
    rel_hi = jnp.asarray(p - 3.0 - 1e-3, f32)

    def ica_rhs(a, b, tx, ty):
        """b = sum(jac_masked * (tmpl - warped)) over both sets — the exact
        math of aligner.ica_rhs: center_to_ul (W*0.5 convention,
        imgproc.cpp:72-75), clamped window positions, weight-normalized
        Lanczos2 sample with bf16 products / f32 accumulation.

        Both keypoint sets share the keyframe windows, so the y-tap loop
        reads each (P, N) window row ONCE and accumulates both sets'
        contractions from it."""
        txu = tx - a * cx + b * cy
        tyu = ty - b * cx - a * cy
        # Mosaic layout rule (hard-won): a value reshape that moves a dim
        # across the sublane boundary ((P,N) -> (P,1,N)) is an unsupported
        # shape cast. All shapes below are built at their final rank.
        rel_xs, rel_ys = [], []
        for s in range(2):
            fx = fx_ref[s][None, :]                      # (1, N) f32
            fy = fy_ref[s][None, :]
            ox = oxy_ref[0][None, :]
            oy = oxy_ref[1][None, :]
            wx_pos = (1.0 + a) * fx - b * fy + txu
            wy_pos = b * fx + (1.0 + a) * fy + tyu
            rel_xs.append(jnp.clip(wx_pos - ox, rel_lo, rel_hi))
            rel_ys.append(jnp.clip(wy_pos - oy, rel_lo, rel_hi))

        nums, den = [], []
        if body_mode == "fused":
            # One fused (P, P, N) contraction per set: Mosaic schedules the
            # elementwise+reduce without the fori dependency chain. Weights
            # are built directly at rank 3 via broadcasted_iota.
            win = win_ref[:]                              # (P, P, N)
            if win.dtype != jnp.bfloat16:
                win = win.astype(jnp.int32).astype(jnp.bfloat16)  # u8 hop
            taps_y3 = jax.lax.broadcasted_iota(
                jnp.int32, (p, 1, n), 0).astype(f32)
            taps_x3 = jax.lax.broadcasted_iota(
                jnp.int32, (1, p, n), 1).astype(f32)
            for s in range(2):
                wy3 = lanczos2(taps_y3 - rel_ys[s][None])   # (P, 1, N)
                wx3 = lanczos2(taps_x3 - rel_xs[s][None])   # (1, P, N)
                den.append(jnp.sum(wy3, axis=0)
                           * jnp.sum(wx3, axis=1))          # (1, N)
                prod = (win * wy3.astype(jnp.bfloat16)) * \
                    wx3.astype(jnp.bfloat16)
                nums.append(jnp.sum(jnp.sum(prod.astype(f32), axis=0),
                                    axis=0, keepdims=True))
        else:
            nums, den = _tap_sample(win_ref, rel_xs, rel_ys, p, n)

        bvec = [jnp.zeros((), f32) for _ in range(4)]
        for s in range(2):
            residual = tmpl_ref[s][None, :] - nums[s] / den[s]   # (1, N)
            for k in range(4):
                bvec[k] = bvec[k] + jnp.sum(
                    jacm_ref[k * 2 + s][None, :] * residual)
        return bvec

    c0 = [_warp_corner(*t0, x, y, cx, cy) for (x, y) in corners]

    def cond(carry):
        _, _, it, conv = carry
        return jnp.logical_and(jnp.logical_not(conv), it < max_iters)

    def body(carry):
        t, prev_c, it, conv = carry
        a, b, tx, ty = t
        bvec = ica_rhs(a, b, tx, ty)
        dt = [sum(hinv[k][j] * bvec[j] for j in range(4)) for k in range(4)]
        da = dt[0] * jac_scale
        db = dt[1] * jac_scale
        # compose(delta, t): delta applied first (alignment.cpp:639).
        p1 = 1.0 + da
        q1 = db
        p2 = 1.0 + a
        q2 = b
        t_new = (p2 * p1 - q2 * q1 - 1.0,
                 p2 * q1 + q2 * p1,
                 p2 * dt[2] - q2 * dt[3] + tx,
                 q2 * dt[2] + p2 * dt[3] + ty)
        new_c = [_warp_corner(*t_new, x, y, cx, cy) for (x, y) in corners]
        disp12 = jnp.zeros((), f32)
        for (nx, ny), (px, py) in zip(new_c, prev_c):
            disp12 = jnp.maximum(
                disp12, jnp.sqrt((nx - px) ** 2 + (ny - py) ** 2))
        t_out = tuple(jnp.asarray(v, f32) for v in t_new)
        conv_new = disp12 < thr
        return (t_out, tuple((jnp.asarray(x, f32), jnp.asarray(y, f32))
                             for (x, y) in new_c), it + 1, conv_new)

    (t_f, c1, iters, conv) = jax.lax.while_loop(
        cond, body,
        (tuple(jnp.asarray(v, f32) for v in t0),
         tuple((jnp.asarray(x, f32), jnp.asarray(y, f32)) for (x, y) in c0),
         jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_)))

    disp01 = jnp.zeros((), f32)
    for (x1, y1), (x0, y0) in zip(c1, c0):
        disp01 = jnp.maximum(
            disp01, jnp.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2))

    out_ref[0, :] = jnp.stack([
        t_f[0], t_f[1], t_f[2], t_f[3],
        conv.astype(f32), disp01, iters.astype(f32), jnp.zeros((), f32)])


def gn_solve_pallas(windows, tmpl, jac_masked, hinv, fx, fy, ox, oy,
                    t_init, threshold, *, width, height, max_iters,
                    corners, interpret: bool | None = None,
                    body_mode: str = "tap"):
    """Run the whole per-level GN while_loop in one Pallas program.

    Args:
      windows: (P, P, N) bf16 keyframe sampling windows (stay VMEM-resident
        across all iterations — the point of the kernel).
      tmpl: (2, N) f32 template intensities.
      jac_masked: (4, 2, N) f32 masked+averaged Jacobian rows.
      hinv: (4, 4) f32 regularized inverse Hessian.
      fx, fy: (2, N) f32 keypoint coordinates.
      ox, oy: (N,) f32 window origins.
      t_init: (4,) f32 initial transform (center-pivot).
      threshold: () f32 traced convergence threshold (px).
      width, height, max_iters: static level geometry / iteration cap.
      corners: static ((x, y) * 4) GN convergence corners
        (the (w-1, h-1) extent, alignment.cpp:590-593).
      interpret: None = auto (interpret everywhere but real TPU).
      body_mode: ICA-RHS kernel body. "tap" (default, the shipped form)
        loops window rows with a fori_loop; "fused" emits one rank-3
        contraction per set — numerically equivalent (interpreter-tested)
        but the Mosaic compile of the fused form was observed to run for
        >20 minutes without finishing (docs/ROADMAP.md Mosaic ledger), so
        compiling it on real TPU is refused. Interpreter-mode use for
        numerics experiments remains allowed.

    Returns:
      (t_final (4,), converged (), disp01 (), iters ()) matching the XLA
      loop in models/aligner._align_level.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p, _, n = windows.shape
    f32 = jnp.float32

    if body_mode not in ("tap", "fused"):
        raise ValueError(f"body_mode must be 'tap' or 'fused', got "
                         f"{body_mode!r}")
    if body_mode == "fused" and not interpret:
        raise ValueError(
            "body_mode='fused' is interpreter-only: its Mosaic compile was "
            "observed to run >20 minutes without finishing (see the Mosaic "
            "lessons ledger, docs/ROADMAP.md). Use the default 'tap' body "
            "on real TPU.")
    kernel = functools.partial(
        _gn_kernel, p=p, n=n, max_iters=int(max_iters),
        jac_scale=1.0 / float(width), corners=tuple(corners),
        cx=float(width) * 0.5, cy=float(height) * 0.5, body_mode=body_mode)

    win_bytes = p * p * n * jnp.dtype(windows.dtype).itemsize
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 8), f32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # threshold (1,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # t_init (1,4)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # hinv (4,4)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # windows (P,P,N)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # tmpl (2,N)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # jacm (8,N)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # fx (2,N)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # fy (2,N)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # oxy (2,N)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(win_bytes + SCRATCH_BYTES,
                                 VMEM_BUDGET_BYTES)),
        interpret=interpret,
    )(
        jnp.reshape(threshold.astype(f32), (1, 1)),
        t_init.astype(f32).reshape(1, 4),
        hinv.astype(f32),
        windows,
        tmpl.astype(f32),
        jac_masked.astype(f32).reshape(8, n),
        fx.astype(f32),
        fy.astype(f32),
        jnp.stack([ox, oy]).astype(f32),
    )
    t_final = out[0, :4]
    converged = out[0, 4] > 0.5
    disp01 = out[0, 5]
    iters = out[0, 6].astype(jnp.int32)
    return t_final, converged, disp01, iters


# --------------------------------------------------------------------------
# 8-DOF homography GN kernel (the 4K config-4 path).
#
# The homography aligner runs the XLA while_loop at EVERY level; at 4K its
# per-level GN bodies unroll into ~33k tiny fusions per 32-frame chunk
# program — 24.5% of leaf time, all fixed per-op dispatch (the round-3 4K
# profile, BASELINE.md). This kernel is the same restructuring as the 4-DOF
# one: the whole while_loop in ONE Pallas program with the windows
# VMEM-resident and a pure-scalar carry, so both the soup and the
# per-iteration HBM window re-reads disappear for every fit-in-VMEM level.
# Math replicates models/homography_aligner._align_level_h exactly:
# normalized-coordinate projective warp (homography.py:49-55), textbook GN
# step dt = Hinv b, compose H(p) @ H(dt) with H22 normalization
# (homography.py:76-78), per-iteration corner-movement convergence.
# Operand-shape contract matches the 4-DOF kernel (batch-free last two
# dims) so jax.vmap over streams lowers through the batching rule.
# --------------------------------------------------------------------------

def _h_entries(q):
    """H(q) as a 3x3 nested scalar list (homography.py:30-36)."""
    return [[1.0 + q[0], q[1], q[2]],
            [q[3], 1.0 + q[4], q[5]],
            [q[6], q[7], jnp.ones_like(q[0])]]


def _compose_h(dt, pv):
    """compose(dt, p): M = H(p) @ H(dt), normalized so M[2][2] = 1, back to
    the 8-vector (homography.py:39-46, 76-78) — all scalar FMAs."""
    m2 = _h_entries(pv)
    m1 = _h_entries(dt)
    m = [[sum(m2[i][k] * m1[k][j] for k in range(3)) for j in range(3)]
         for i in range(3)]
    inv = 1.0 / m[2][2]
    return (m[0][0] * inv - 1.0, m[0][1] * inv, m[0][2] * inv,
            m[1][0] * inv, m[1][1] * inv - 1.0, m[1][2] * inv,
            m[2][0] * inv, m[2][1] * inv)


def _warp_corner_h(pv, u, v, width, cx, cy):
    """Projective warp of one static normalized corner back to pixels."""
    nx = (1.0 + pv[0]) * u + pv[1] * v + pv[2]
    ny = pv[3] * u + (1.0 + pv[4]) * v + pv[5]
    den = pv[6] * u + pv[7] * v + 1.0
    return (nx / den * width + cx, ny / den * width + cy)


def _gn8_kernel(thr_ref, p0_ref, hinv_ref, win_ref, tmpl_ref, jacm_ref,
                uv_ref, oxy_ref, out_ref, *,
                p, n, max_iters, width, cx, cy, corners_norm):
    f32 = jnp.float32
    thr = thr_ref[0, 0]
    p0 = tuple(p0_ref[0, k] for k in range(8))
    hinv = [[hinv_ref[i, j] for j in range(8)] for i in range(8)]
    rel_lo = jnp.asarray(2.0, f32)
    rel_hi = jnp.asarray(p - 3.0 - 1e-3, f32)

    def ica_rhs(pv):
        """b = sum(jac_masked * (tmpl - warped)) over both sets — the exact
        math of homography_aligner's rhs: normalized projective warp
        (_warp_rel_h), clamped window positions, weight-normalized Lanczos2
        sample."""
        rel_xs, rel_ys = [], []
        for s in range(2):
            u = uv_ref[s][None, :]                        # (1, N)
            v = uv_ref[2 + s][None, :]
            ox = oxy_ref[0][None, :]
            oy = oxy_ref[1][None, :]
            den = pv[6] * u + pv[7] * v + 1.0
            wx = ((1.0 + pv[0]) * u + pv[1] * v + pv[2]) / den * width + cx
            wy = (pv[3] * u + (1.0 + pv[4]) * v + pv[5]) / den * width + cy
            rel_xs.append(jnp.clip(wx - ox, rel_lo, rel_hi))
            rel_ys.append(jnp.clip(wy - oy, rel_lo, rel_hi))

        nums, den_w = _tap_sample(win_ref, rel_xs, rel_ys, p, n)

        bvec = [jnp.zeros((), f32) for _ in range(8)]
        for s in range(2):
            residual = tmpl_ref[s][None, :] - nums[s] / den_w[s]   # (1, N)
            for k in range(8):
                bvec[k] = bvec[k] + jnp.sum(
                    jacm_ref[k * 2 + s][None, :] * residual)
        return bvec

    c0 = [_warp_corner_h(p0, u, v, width, cx, cy) for (u, v) in corners_norm]

    def cond(carry):
        _, _, it, conv = carry
        return jnp.logical_and(jnp.logical_not(conv), it < max_iters)

    def body(carry):
        pv, prev_c, it, conv = carry
        bvec = ica_rhs(pv)
        dt = tuple(sum(hinv[k][j] * bvec[j] for j in range(8))
                   for k in range(8))
        p_new = _compose_h(dt, pv)
        new_c = [_warp_corner_h(p_new, u, v, width, cx, cy)
                 for (u, v) in corners_norm]
        disp12 = jnp.zeros((), f32)
        for (nx, ny), (px, py) in zip(new_c, prev_c):
            disp12 = jnp.maximum(
                disp12, jnp.sqrt((nx - px) ** 2 + (ny - py) ** 2))
        p_out = tuple(jnp.asarray(q, f32) for q in p_new)
        return (p_out, tuple((jnp.asarray(x, f32), jnp.asarray(y, f32))
                             for (x, y) in new_c), it + 1, disp12 < thr)

    (p_f, c1, iters, conv) = jax.lax.while_loop(
        cond, body,
        (tuple(jnp.asarray(q, f32) for q in p0),
         tuple((jnp.asarray(x, f32), jnp.asarray(y, f32)) for (x, y) in c0),
         jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_)))

    disp01 = jnp.zeros((), f32)
    for (x1, y1), (x0, y0) in zip(c1, c0):
        disp01 = jnp.maximum(
            disp01, jnp.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2))

    out_ref[0, :] = jnp.stack([
        p_f[0], p_f[1], p_f[2], p_f[3], p_f[4], p_f[5], p_f[6], p_f[7],
        conv.astype(f32), disp01, iters.astype(f32), jnp.zeros((), f32)])


def gn8_solve_pallas(windows, tmpl, jac_masked, hinv, u, v, ox, oy,
                     p_init, threshold, *, width, height, max_iters,
                     interpret: bool | None = None):
    """Run the whole 8-DOF per-level GN while_loop in one Pallas program.

    Args:
      windows: (P, P, N) bf16 keyframe sampling windows (VMEM-resident
        across all iterations).
      tmpl: (2, N) template intensities.
      jac_masked: (8, 2, N) masked Jacobian rows (homography_aligner's
        jac * mask — no 0.5 set-average in the 8-DOF model).
      hinv: (8, 8) regularized inverse Hessian.
      u, v: (2, N) centered width-NORMALIZED keypoint coordinates
        (homography.py:58-62).
      ox, oy: (N,) window origins in PIXELS.
      p_init: (8,) initial homography parameters.
      threshold: () traced convergence threshold (px).
      width, height, max_iters: static level geometry / iteration cap.
      interpret: None = auto (interpret everywhere but real TPU).

    Returns:
      (p_final (8,), converged (), disp01 (), iters ()) matching the XLA
      loop in models/homography_aligner._align_level_h.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p, _, n = windows.shape
    f32 = jnp.float32
    w_l, h_l = float(width), float(height)
    cx, cy = w_l * 0.5, h_l * 0.5
    # The GN convergence corners in normalized coords ((w-1, h-1) extent,
    # homography_aligner.py corner table) — static per level.
    corners_px = ((0.0, 0.0), (w_l - 1.0, 0.0), (0.0, h_l - 1.0),
                  (w_l - 1.0, h_l - 1.0))
    corners_norm = tuple(((x - cx) / w_l, (y - cy) / w_l)
                         for (x, y) in corners_px)

    kernel = functools.partial(
        _gn8_kernel, p=p, n=n, max_iters=int(max_iters), width=w_l,
        cx=cx, cy=cy, corners_norm=corners_norm)

    win_bytes = p * p * n * jnp.dtype(windows.dtype).itemsize
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 12), f32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # threshold (1,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # p_init (1,8)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # hinv (8,8)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # windows (P,P,N)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # tmpl (2,N)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # jacm (16,N)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # uv (4,N)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # oxy (2,N)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(win_bytes + SCRATCH_BYTES,
                                 VMEM_BUDGET_BYTES)),
        interpret=interpret,
    )(
        jnp.reshape(threshold.astype(f32), (1, 1)),
        p_init.astype(f32).reshape(1, 8),
        hinv.astype(f32),
        windows,
        tmpl.astype(f32),
        jac_masked.astype(f32).reshape(16, n),
        jnp.concatenate([u, v]).astype(f32),      # (4, N)
        jnp.stack([ox, oy]).astype(f32),
    )
    p_final = out[0, :8]
    converged = out[0, 8] > 0.5
    disp01 = out[0, 9]
    iters = out[0, 10].astype(jnp.int32)
    return p_final, converged, disp01, iters
