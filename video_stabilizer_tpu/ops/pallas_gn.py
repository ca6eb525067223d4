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

# Only fit-in-VMEM levels take the Pallas path (1080p L0 windows are
# 10.6 MB; 4K L0 at 42 MB exceeds the practical VMEM budget and falls back
# to the XLA loop).
MAX_WINDOW_BYTES = 24 * 1024 * 1024


def _warp_corner(a, b, tx, ty, x, y, cx, cy):
    """Scalar center-pivot corner warp (imgproc.cpp:401-411)."""
    u = x - cx
    v = y - cy
    return ((1.0 + a) * u - b * v + cx + tx,
            b * u + (1.0 + a) * v + cy + ty)


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
            win = win_ref[:]                              # (P, P, N) bf16
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
            # y-tap fori over window rows: each (P, N) row is read ONCE and
            # feeds both sets' contractions; the y-weight row is recomputed
            # per tap (7 FMAs on (1, N)) to keep the body free of dynamic
            # value indexing.
            taps = jax.lax.broadcasted_iota(jnp.int32, (p, n), 0).astype(f32)
            wx_b = []
            for s in range(2):
                wx_s = lanczos2(taps - rel_xs[s])           # (P, N) f32
                wy_s = lanczos2(taps - rel_ys[s])
                den.append(jnp.sum(wy_s, axis=0, keepdims=True)
                           * jnp.sum(wx_s, axis=0, keepdims=True))
                wx_b.append(wx_s.astype(jnp.bfloat16))

            def tap_row(iy, accs):
                row = win_ref[iy]                           # (P, N) bf16
                iyf = iy.astype(f32)
                new = []
                for s in range(2):
                    wy_row = lanczos2(iyf - rel_ys[s])      # (1, N)
                    prod = (row * wy_row.astype(jnp.bfloat16)) * wx_b[s]
                    new.append(accs[s] + jnp.sum(prod.astype(f32), axis=0,
                                                 keepdims=True))
                return tuple(new)

            nums = list(jax.lax.fori_loop(
                0, p, tap_row,
                (jnp.zeros((1, n), f32), jnp.zeros((1, n), f32))))

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
                    corners, interpret: bool | None = None):
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

    Returns:
      (t_final (4,), converged (), disp01 (), iters ()) matching the XLA
      loop in models/aligner._align_level.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p, _, n = windows.shape
    f32 = jnp.float32

    import os

    body_mode = os.environ.get("VIDSTAB_GN_BODY", "tap")
    kernel = functools.partial(
        _gn_kernel, p=p, n=n, max_iters=int(max_iters),
        jac_scale=1.0 / float(width), corners=tuple(corners),
        cx=float(width) * 0.5, cy=float(height) * 0.5, body_mode=body_mode)

    win_bytes = p * p * n * 2
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
            vmem_limit_bytes=win_bytes + 48 * 1024 * 1024),
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
