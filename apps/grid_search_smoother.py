#!/usr/bin/env python
"""Smoother + decay hyperparameter sweep mirroring the reference's
grid_search_smoother (grid_search_smoother.cpp:164-187): lag x memory x
lambda x displacement-decay grids with validity filters, scored by
output/input jitter ratio.

TPU-native twist: the aligner runs ONCE; only the smoother/accumulator/warp
(cheap) re-run per combo. lambda and the decay parameters are traced and
vmapped; lag/memory change window geometry (static, recompile per pair).
The reference re-ran the full alignment for every combo in a thread pool.

Usage:
    python apps/grid_search_smoother.py [--video PATH] [--frames N]
"""

import argparse
import functools
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--video")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", default="360x640")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_stabilizer_tpu.config import StabilizerParams
    from video_stabilizer_tpu.models.batch import (
        align_clip_impl, smooth_trajectory)
    from video_stabilizer_tpu.ops.fast_warp import warp_image_fast
    from video_stabilizer_tpu import transforms as T
    from video_stabilizer_tpu.utils.io import read_video, synth_shaky_clip
    from video_stabilizer_tpu.utils.jitter import median_jitter_px

    if args.video:
        frames = np.stack(list(read_video(args.video, args.frames)))
    else:
        h, w = (int(v) for v in args.size.split("x"))
        frames = synth_shaky_clip(args.frames, h, w, seed=4, jitter_px=1.0,
                                  pan_px_per_frame=0.3)
    t_n, height, width = frames.shape[:3]
    gray = np.asarray(
        np.round(0.114 * frames[..., 0] + 0.587 * frames[..., 1]
                 + 0.299 * frames[..., 2]), np.uint8)
    in_jitter = median_jitter_px(frames)
    print(f"input: {t_n} frames {width}x{height}, jitter {in_jitter:.3f}px")

    # Align once.
    base = StabilizerParams()
    meas, ok = jax.jit(
        lambda g: align_clip_impl(g, base.aligner, width, height))(
            jnp.asarray(gray))
    meas.block_until_ready()
    print(f"aligned once: {int(np.sum(~np.asarray(ok))) - 1} failures")

    # Grids in the spirit of grid_search_smoother.cpp:164-187 (lag x memory
    # with validity filter lag >= memory; lambda; decay windows).
    lags = [6, 10, 14]
    memories = [3, 5, 8]
    lambdas = [1.0, 2.0, 4.0, 8.0]
    decays = [(48.0, 64.0, 0.9, 0.7), (32.0, 48.0, 0.95, 0.8),
              (64.0, 96.0, 0.85, 0.6)]

    @functools.partial(jax.jit, static_argnames=("params",))
    def eval_combo(measurements, success, lam, decay_vec, params):
        sp = params
        smoothed = smooth_trajectory_lam(measurements, sp, lam)
        accums = accumulate_dyn(measurements, success, smoothed, sp,
                                decay_vec)
        delayed = jnp.asarray(frames)[: t_n - sp.lag]

        def warp_one(fr, acc):
            t_ul = T.center_to_ul(acc, width, height, minus_one=True)
            out = warp_image_fast(fr, t_ul)
            return out[16:-16, 16:-16]

        return jax.lax.map(lambda a: warp_one(*a), (delayed, accums))

    # Re-implementations with traced lambda / decay (models/batch.py's
    # versions read them from static params).
    from video_stabilizer_tpu.models.smoother import tvl1_smooth

    def smooth_trajectory_lam(measurements, params, lam):
        t_total = measurements.shape[0]
        lb, la = params.lag, params.smoother_memory
        window = lb + la + 1
        n_out = t_total - la
        ks = jnp.arange(n_out, dtype=jnp.int32)
        starts = jnp.maximum(0, ks - lb)
        valid = ks + la - starts + 1
        offs = jnp.arange(window, dtype=jnp.int32)
        gidx = jnp.minimum(starts[:, None] + offs[None, :], t_total - 1)
        wins = measurements[gidx]

        def one(winv, k, start, vlen):
            sm = tvl1_smooth(winv.T, lam, valid_len=vlen)
            return jax.lax.dynamic_slice_in_dim(sm, k - start, 1, -1)[:, 0]

        return jax.vmap(one)(wins, ks, starts, valid)

    def accumulate_dyn(measurements, success, smoothed, params, decay_vec):
        min_disp, max_disp, min_decay, max_decay = decay_vec
        t_total = measurements.shape[0]
        lag = params.lag
        offset = lag - params.smoother_memory

        def step(accum, i):
            accum = jnp.where(success[i], accum, jnp.zeros(4, jnp.float32))
            m = i - lag

            def fold(acc):
                mm = measurements[m]
                sm = smoothed[jnp.minimum(m + offset, smoothed.shape[0] - 1)]
                jitter = T.compose(mm, T.inverse(sm))
                na = T.compose(acc, jitter)
                disp = T.max_corner_displacement(na, width, height)
                f = jnp.clip((disp - min_disp) / (max_disp - min_disp), 0, 1)
                decay = jnp.where(disp > max_disp, max_decay,
                                  jnp.where(disp > min_disp,
                                            min_decay * (1 - f) + max_decay * f,
                                            min_decay))
                return na * decay

            accum = jnp.where(m >= 0, fold(accum), accum)
            return accum, accum

        _, accums = jax.lax.scan(step, jnp.zeros(4, jnp.float32),
                                 jnp.arange(t_total, dtype=jnp.int32))
        return accums[lag:]

    results = {}
    t0 = time.time()
    for lag, memory in itertools.product(lags, memories):
        if lag < memory:  # validity filter like the reference
            continue
        params = StabilizerParams(lag=lag, smoother_memory=memory)
        for lam in lambdas:
            for dv in decays:
                outs = eval_combo(jnp.asarray(meas), jnp.asarray(ok),
                                  jnp.float32(lam),
                                  jnp.asarray(dv, jnp.float32), params)
                out_j = median_jitter_px(list(np.asarray(outs)))
                results[(lag, memory, lam, dv)] = out_j / max(in_jitter, 1e-9)
    print(f"swept {len(results)} combos in {time.time()-t0:.1f}s")

    best = sorted(results.items(), key=lambda kv: kv[1])
    print("\n top 10 combos:")
    for (lag, memory, lam, dv), ratio in best[:10]:
        print(f"  ratio={ratio:.4f}  lag={lag} memory={memory} lambda={lam} "
              f"decay={dv}")


if __name__ == "__main__":
    main()
