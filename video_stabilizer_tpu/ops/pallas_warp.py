"""Pallas TPU output warp with BLOCK-LOCAL integer bases, batched.

The XLA FIR warp (ops/fast_warp.py) removes one global integer translation
and spends 2*(m+1) full-frame shifted-add taps per axis, with every tap a
fresh HBM read of the padded source; its residual bound m must cover
|A,B| * full_image_radius. This kernel restructures the same math around
the memory hierarchy (SURVEY.md §2.2's schedule layer, done the TPU way):

  - the batch of output frames is tiled over a (frame, rows, cols) grid;
    each program computes one (TILE_H, TILE_W) tile for all channels of one
    frame — batching lives IN the grid, not in an outer vmap (Pallas ANY-
    space operands cannot be batched by vmap);
  - each tile removes its OWN integer base displacement — the warp
    evaluated at the tile center, rounded — with one haloed u8 block DMA
    from HBM into VMEM;
  - the residual the separable FIR must absorb is then only
    |A,B| * tile_radius + subpixel, so m = 3 covers |A,B| <= ~0.008 at ANY
    resolution (vs 0.0027 at 1080p for the global-base kernel with m = 4)
    while doing 8 taps/axis instead of 10;
  - the y-pass intermediate lives entirely in VMEM: HBM traffic per frame
    is one zero-pad of the source, one ~1.6x tile-halo read, and one
    output write — vs tap-per-tap HBM reads in the XLA FIR version.

Mosaic alignment contract (discovered empirically; the compiler refuses
anything else): HBM DMA slice OFFSETS and SHAPES must be aligned to the
u8 (8, 128) tiling. The per-tile base is therefore rounded DOWN to the
tiling grid and the remainder absorbed in VMEM:
  - row remainder qy in [0, 8): absorbed by one of three bit-identical
    schedule mechanisms (qy_mode): 8 extra static y-taps ("taps"), one
    dynamic sublane rotate ("roll"), or an 8-way static-slice branch
    ("switch") — see _warp_kernel;
  - column remainder qx in [0, 128): lanes allow NO dynamic offsets at
    all, so the shift is a one-hot (BW, TW + 2*(m+2)) band-matrix matmul
    on the MXU — bf16 inputs (u8-derived values are exact in bf16), f32
    accumulation, ~2% of the pipeline's FLOPs.

Same approximation contract as fast_warp (the y-pass weight is evaluated
at the read column; error O(B * halo * |grad|)), same zero border, same u8
rounding — pinned against warp_image_bgr / warp_image_fast in
tests/test_pallas_warp.py.

Replaces the reference's cv::warpAffine INTER_LINEAR output warp
(imgproc.cpp:446-484) on the TPU serving path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from video_stabilizer_tpu.ops.lanczos import lanczos2

# 1080p/4K tile: 1080 = 5*216, 2160 = 10*216; 1920 -> 4x512 blocks
# (last block 25% padded; wider tiles fit since the scoped VMEM limit was
# raised to 100M — see VIDSTAB_WARP_TILE and the round-5 tile sweep in
# docs/QY_BENCH_r5.log: 216x640 divides 1920/3840 exactly and wins at 4K).
TILE_H = 216
TILE_W = 512

# Row-remainder mechanism default (see _warp_kernel qy_mode). Resolved
# ONCE at import (the pattern ADVICE round-3 asked for: no trace-time env
# reads); VIDSTAB_WARP_QY exists for on-hardware A/Bs of the shipped
# default. All three modes are bit-identical (tests/test_pallas_warp.py).
_DEFAULT_QY_MODE = os.environ.get("VIDSTAB_WARP_QY", "taps")
if _DEFAULT_QY_MODE not in ("taps", "roll", "switch"):
    raise ValueError(f"VIDSTAB_WARP_QY must be taps|roll|switch, "
                     f"got {_DEFAULT_QY_MODE!r}")
# Tile-shape override for on-hardware A/Bs of the shipped (TILE_H, TILE_W)
# schedule default (e.g. VIDSTAB_WARP_TILE=216x640). Resolved once at
# import like the qy knob; the `tile` call argument still wins.
_DEFAULT_TILE = os.environ.get("VIDSTAB_WARP_TILE")
if _DEFAULT_TILE is not None:
    _DEFAULT_TILE = tuple(int(v) for v in _DEFAULT_TILE.split("x"))
    if len(_DEFAULT_TILE) != 2:
        raise ValueError("VIDSTAB_WARP_TILE must be HxW, e.g. 216x640")
MAX_SHIFT = 192  # static bound on the bulk translation, like fast_warp
BH_PAD = 24      # extra DMA rows: 2*XT + qy(<8), rounded to the 8-tiling
BW_PAD = 256     # extra DMA cols: 2*XT + qx(<128), rounded to the 128-tiling


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _positions_similarity(t_row, rows, cols):
    """Sampling positions of the 4-param similarity (origin-based)."""
    a, b, tx, ty = t_row[0], t_row[1], t_row[2], t_row[3]
    wx = (1.0 + a) * cols - b * rows + tx
    wy = b * cols + (1.0 + a) * rows + ty
    return wx, wy


def _positions_homography(t_row, rows, cols, img_w, img_h):
    """Sampling positions of the 8-param normalized homography — the same
    centered width-normalized parameterization as homography.warp_points
    (center W*0.5, scale 1/W)."""
    cx = img_w * 0.5
    cy = img_h * 0.5
    inv_w = 1.0 / img_w
    u = (cols - cx) * inv_w
    v = (rows - cy) * inv_w
    num_x = (1.0 + t_row[0]) * u + t_row[1] * v + t_row[2]
    num_y = t_row[3] * u + (1.0 + t_row[4]) * v + t_row[5]
    den = t_row[6] * u + t_row[7] * v + 1.0
    inv_den = 1.0 / den
    wx = num_x * inv_den * img_w + cx
    wy = num_y * inv_den * img_w + cy
    return wx, wy


def _warp_kernel(t_ref, img_ref, out_ref, scratch, shifted, sem, *,
                 m, interp, c, pad_lo, tile_h, tile_w, model, img_w, img_h,
                 qy_mode):
    """One (tile_h, tile_w) output tile, all channels of frame pid(0).

    t_ref: (B, P) SMEM sampling-transform rows (P=4 similarity origin-based
      [a, b, tx, ty]; P=8 normalized homography) — full array, SMEM lanes
      can't be block-subdivided; this program reads row pid(0).
    img_ref: (B, C, Hp, Wp) zero-padded planar u8 source in HBM/ANY.
    out_ref: (1, C, tile_h, tile_w) u8 VMEM block.
    scratch: (2, C, tile_h + BH_PAD, tile_w + BW_PAD) u8 VMEM — two DMA
      slots: program p consumes slot p%2 (started by program p-1) and
      prefetches p+1's block into the other slot, hiding the per-tile DMA
      latency behind the previous tile's compute (grid programs execute in
      row-major order on TPU).
    shifted: (C, tile_h + BH_PAD, tile_w + 2*(m+2)) f32 VMEM — the
      column-remainder-shifted block (values still exact u8 integers).
    """
    f32 = jnp.float32
    xt = m + 2                      # tap reach per side
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)
    nparams = 4 if model == "similarity" else 8
    blk_h = tile_h + BH_PAD
    blk_w = tile_w + BW_PAD

    def tile_base(b, i, j):
        """Aligned DMA base + remainders for grid cell (b, i, j)."""
        t_row = [t_ref[b, k] for k in range(nparams)]

        def positions(rows, cols):
            if model == "similarity":
                return _positions_similarity(t_row, rows, cols)
            return _positions_homography(t_row, rows, cols, img_w, img_h)

        y0 = i * tile_h
        x0 = j * tile_w
        xc = x0.astype(f32) + tile_w * 0.5
        yc = y0.astype(f32) + tile_h * 0.5
        wxc, wyc = positions(yc, xc)
        kx = jnp.clip(jnp.round(wxc - xc),
                      -MAX_SHIFT, MAX_SHIFT).astype(jnp.int32)
        ky = jnp.clip(jnp.round(wyc - yc),
                      -MAX_SHIFT, MAX_SHIFT).astype(jnp.int32)
        raw_y = y0 + ky + pad_lo - xt
        raw_x = x0 + kx + pad_lo - xt
        base_y = pl.multiple_of((raw_y // 8) * 8, 8)
        base_x = pl.multiple_of((raw_x // 128) * 128, 128)
        return positions, kx, ky, raw_y - base_y, raw_x - base_x, \
            base_y, base_x

    def start_dma(b, i, j, slot):
        _, _, _, _, _, by, bx = tile_base(b, i, j)
        pltpu.make_async_copy(
            img_ref.at[b, :, pl.ds(by, blk_h), pl.ds(bx, blk_w)],
            scratch.at[slot], sem.at[slot]).start()

    lin = (bi * n_i + ti) * n_j + tj
    slot = jax.lax.rem(lin, 2)
    is_first = lin == 0
    total = pl.num_programs(0) * n_i * n_j

    @pl.when(is_first)
    def _():
        start_dma(bi, ti, tj, slot)

    # Prefetch the NEXT program's block into the other slot.
    nxt = lin + 1

    @pl.when(nxt < total)
    def _():
        j2 = jax.lax.rem(nxt, n_j)
        i2 = jax.lax.rem(nxt // n_j, n_i)
        b2 = nxt // (n_i * n_j)
        start_dma(b2, i2, j2, 1 - slot)

    positions, kx, ky, qy, qx, base_y, base_x = tile_base(bi, ti, tj)
    y0 = ti * tile_h
    x0 = tj * tile_w
    y0f = y0.astype(f32)
    x0f = x0.astype(f32)
    cp_wait = pltpu.make_async_copy(
        img_ref.at[bi, :, pl.ds(base_y, blk_h), pl.ds(base_x, blk_w)],
        scratch.at[slot], sem.at[slot])

    weight = _hat if interp == "bilinear" else lanczos2
    lo = -m if interp == "bilinear" else -m - 1
    hi = m + 2 if interp == "bilinear" else m + 3
    need_den = interp != "bilinear"

    # Residual sample positions over the x-extended columns the x-taps
    # will read. Column u of the shifted block feeds output columns near
    # x0 + u - xt, so the y-pass weight is evaluated at THAT output
    # column (fast_warp's read-column approximation — NOT at the source
    # column, which sits a further bulk-shift kx away and would add an
    # O(B * kx) position error).
    tws = tile_w + 2 * xt
    rows_e = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tws), 0)
              .astype(f32) + y0f)
    cols_e = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tws), 1)
              .astype(f32) - float(xt) + x0f)
    wy = positions(rows_e, cols_e)[1]
    ry = jnp.clip(wy - rows_e - ky.astype(f32), -float(m), float(m))

    cp_wait.wait()

    # Column-remainder shift as ONE dynamic lane rotate for the whole
    # block: shifted[u] must hold scratch column u + qx (true column
    # x0 + kx - xt + u). pltpu.roll right-rolls by a (possibly traced)
    # amount, so a left shift by qx is a right roll by blk_w - qx:
    # rolled[x] = blk[(x + qx) mod blk_w], and x + qx < tws + 128 <= blk_w
    # for every stored column, so no wrapped lane is ever read; the
    # shifted store stays bit-exact (u8-derived integers).
    # (This replaced a dense (c*blk_h, blk_w) x (blk_w, tws) one-hot
    # matmul — ~0.58 GFLOP of MXU work per tile just to move lanes;
    # tpu.dynamic_rotate does it for free on the VPU.)
    # tpu.dynamic_rotate is 32-bit only: rotate as i32, then narrow.
    blk_i32 = scratch[slot].astype(jnp.int32)
    rolled = pltpu.roll(blk_i32, blk_w - qx, 2)
    if qy_mode == "roll":
        # Absorb the row remainder with ONE dynamic sublane rotate too:
        # rolled2[s] = rolled[(s + qy) mod blk_h], so shifted[d + i] holds
        # true row y0 + ky - xt + d + i directly and the y-tap range needs
        # no +8 extension (wrapped rows start at blk_h - qy >= tile_h +
        # BH_PAD - 7 = tile_h + 17, above the max tap read tile_h + 2m+3
        # for any valid tile). The kernel is VPU-bound: dropping 8 of the 17
        # y-taps is the single largest win (see qy_mode in the wrapper).
        rolled = pltpu.roll(rolled, blk_h - qy, 1)
    # f32 store (u8 values are exact): the y-taps then read f32 rows
    # directly instead of paying a bf16->f32 convert per tap — on a
    # VPU-bound kernel the converts are real vector ops, VMEM is not the
    # constraint.
    shifted[...] = rolled[:, :, :tws].astype(jnp.float32)

    # Row remainder qy in [0, 8): three mechanisms (weights are evaluated
    # per-pixel either way; only where qy lands differs):
    #   "taps"  — qy shifts the residual and the static tap range extends
    #             by 8 (the original form: 8 extra weighted passes);
    #   "roll"  — one dynamic sublane rotate above absorbs qy, 9 taps;
    #   "switch"— 8-way branch on the scalar qy with per-branch STATIC
    #             slice starts, 9 taps (fallback if Mosaic refuses the
    #             dynamic sublane rotate).
    # shifted[d + i] holds true row y0 + ky - xt - qy + d + i ("taps",
    # "switch") or y0 + ky - xt + d + i ("roll").
    lo2 = lo + xt
    if qy_mode == "taps":
        ry_eff = ry + float(xt) + qy.astype(f32)
        hi2 = hi + xt + 8
    else:
        ry_eff = ry + float(xt)
        hi2 = hi + xt

    def y_pass(q):
        tmp = jnp.zeros((c, tile_h, tws), f32)
        den_y = (jnp.zeros((tile_h, tws), f32) if need_den
                 else jnp.zeros((1, 1), f32))
        for d in range(lo2, hi2):
            rows = shifted[:, d + q : d + q + tile_h, :]
            wgt = weight(ry_eff - d)
            tmp = tmp + wgt[None] * rows
            if need_den:
                den_y = den_y + wgt
        return tmp, den_y

    if qy_mode == "switch":
        tmp, den_y = jax.lax.switch(qy, [functools.partial(y_pass, q)
                                         for q in range(8)])
    else:
        tmp, den_y = y_pass(0)
    if not need_den:
        den_y = None

    rows_o = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
              .astype(f32) + y0f)
    cols_o = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
              .astype(f32) + x0f)
    wx = positions(rows_o, cols_o)[0]
    rx = jnp.clip(wx - cols_o - kx.astype(f32), -float(m), float(m))

    # Unaligned static LANE slices crash the Mosaic compiler; rotate the
    # lanes instead. pltpu.roll only rolls right, so a left shift by k is
    # a right roll by tws - k: rolled[x] = tmp[(x + k) mod tws], and
    # x + k < tws for every x < tile_w, so [:tile_w] never sees wrapped
    # columns.
    out = jnp.zeros((c, tile_h, tile_w), f32)
    den = jnp.zeros((tile_h, tile_w), f32) if need_den else None
    for e in range(lo, hi):
        wgt = weight(rx - e)
        rolled = pltpu.roll(tmp, tws - (xt + e), 2)[:, :, :tile_w]
        out = out + wgt[None] * rolled
        if need_den:
            den = den + wgt * pltpu.roll(den_y, tws - (xt + e),
                                         1)[:, :tile_w]

    if need_den:
        out = out / jnp.maximum(den[None], 1e-6)
    # Mosaic has no direct f32 <-> u8 casts; hop through int32.
    out_ref[0] = (jnp.clip(jnp.round(out), 0.0, 255.0)
                  .astype(jnp.int32).astype(jnp.uint8))


def warp_frames_pallas(frames, ts, interp: str = "bilinear",
                       local_bound: int = 3, interpret: bool | None = None,
                       model: str = "similarity", qy_mode: str | None = None,
                       tile: tuple[int, int] | None = None):
    """Batched dst(p) = interp(img, W(p)) with zero border (Pallas TPU).

    Args:
      frames: (..., H, W, C) u8 — arbitrary leading batch axes (streams,
        time); they are flattened into the kernel grid.
      ts: (..., 4) origin-based *sampling* similarity transforms, or
        (..., 8) normalized homographies when model="homography" (the
        homography.warp_points parameterization).
      interp: "bilinear" (cv INTER_LINEAR parity) or "lanczos2".
      local_bound: static residual bound m AFTER tile-local base removal;
        3 covers |A,B| <= (m-1)/tile_radius ~= 0.008 at any resolution.
      interpret: force Pallas interpreter mode (None = auto: interpret
        everywhere except real TPU backends, so CPU tests run this kernel).
      model: "similarity" or "homography".
      qy_mode: how the kernel absorbs the 8-row DMA alignment remainder —
        "taps" (8 extra static y-taps), "roll" (one dynamic sublane
        rotate), or "switch" (8-way static-slice branch). Bit-identical
        outputs; a pure schedule choice (see _warp_kernel).
      tile: optional (tile_h, tile_w) override of the (TILE_H, TILE_W)
        default — a schedule knob (VPU lane padding: the x-extended width
        tile_w + 2*(m+2) rounds up to 128 lanes, so wider tiles waste
        less). tile_h % 8 == 0 and tile_w % 128 == 0 required.

    Returns:
      (..., H, W, C) u8 warped frames.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if qy_mode is None:
        qy_mode = _DEFAULT_QY_MODE
    if qy_mode not in ("taps", "roll", "switch"):
        raise ValueError(f"qy_mode must be 'taps', 'roll', or 'switch', "
                         f"got {qy_mode!r}")
    batch_shape = frames.shape[:-3]
    h, w, c = frames.shape[-3:]
    bsz = 1
    for d in batch_shape:
        bsz *= d
    nparams = 4 if model == "similarity" else 8
    flat = frames.reshape((bsz, h, w, c))
    ts_flat = ts.reshape((bsz, nparams)).astype(jnp.float32)

    if tile is None:
        tile = _DEFAULT_TILE or (TILE_H, TILE_W)
    tile_h, tile_w = tile
    if tile_h % 8 or tile_w % 128:
        raise ValueError(f"tile must be (8k, 128k)-aligned, got "
                         f"({tile_h}, {tile_w})")
    m = local_bound
    xt = m + 2
    assert 2 * xt + 8 <= BH_PAD and 2 * xt + 128 <= BW_PAD, \
        "taps exceed the aligned DMA halo"
    # Low pad: the aligned base can sit up to 127 cols / 7 rows below the
    # raw base, which itself reaches MAX_SHIFT + xt below the image.
    pad_lo = MAX_SHIFT + xt + 128
    grid = (bsz, pl.cdiv(h, tile_h), pl.cdiv(w, tile_w))
    # High pad: bulk shift + block extent + grid overshoot.
    pad_hi_y = MAX_SHIFT + BH_PAD + grid[1] * tile_h - h + 8
    pad_hi_x = MAX_SHIFT + BW_PAD + grid[2] * tile_w - w + 8

    planar = jnp.pad(flat.transpose(0, 3, 1, 2),
                     ((0, 0), (0, 0), (pad_lo, pad_hi_y),
                      (pad_lo, pad_hi_x)))

    kernel = functools.partial(
        _warp_kernel, m=m, interp=interp, c=c,
        pad_lo=pad_lo, tile_h=tile_h, tile_w=tile_w,
        model=model, img_w=float(w), img_h=float(h), qy_mode=qy_mode)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, c, h, w), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, c, tile_h, tile_w),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, c, tile_h + BH_PAD, tile_w + BW_PAD), jnp.uint8),
            pltpu.VMEM((c, tile_h + BH_PAD, tile_w + 2 * xt), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ts_flat, planar)

    return out.transpose(0, 2, 3, 1).reshape(batch_shape + (h, w, c))


def warp_image_pallas(img, t_sample_ul, interp: str = "bilinear",
                      local_bound: int = 3, out_dtype=jnp.uint8,
                      interpret: bool | None = None,
                      qy_mode: str | None = None):
    """Single-image wrapper of :func:`warp_frames_pallas` (accepts (H, W)
    or (H, W, C) u8)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    out = warp_frames_pallas(img[None], t_sample_ul[None], interp=interp,
                             local_bound=local_bound, interpret=interpret,
                             qy_mode=qy_mode)
    out = out[0].astype(out_dtype)
    return out[..., 0] if squeeze else out
