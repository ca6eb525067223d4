#!/usr/bin/env python
"""Aligner hyperparameter sweep mirroring the reference's grid_search_align
(grid_search_align.cpp:135-210): phase_correlate x threshold x
smallest_fraction x max_displacement combos, smoother disabled
(grid_search_align.cpp:167), scored by output/input jitter ratio.

TPU-native twist: threshold/fraction/max_displacement are TRACED aligner
parameters (models.aligner.DynAlignParams), so all combos of one
phase-correlate setting run as a single vmapped XLA program — no thread
pool, no recompiles per combo (the reference spawned one full
VideoStabilizer per combo per worker thread).

Usage:
    python apps/grid_search_align.py [--video PATH | --synthetic]
        [--frames N] [--size HxW]
"""

import argparse
import dataclasses
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--video", help="input clip (default: synthetic)")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", default="360x640")
    ap.add_argument("--with-phase", action="store_true",
                    help="also sweep phase_correlate=True (2nd compile)")
    ap.add_argument("--device-metric", action="store_true",
                    help="score with the on-device dense-LK jitter metric "
                         "(utils/flow.py) instead of host cv2 Farneback — "
                         "no host round trips per combo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import functools

    from video_stabilizer_tpu.config import AlignerParams, StabilizerParams
    from video_stabilizer_tpu.models.aligner import DynAlignParams
    from video_stabilizer_tpu.models.batch import (
        align_clip_impl, accumulate_corrections)
    from video_stabilizer_tpu.ops.fast_warp import warp_image_fast
    from video_stabilizer_tpu import transforms as T
    from video_stabilizer_tpu.utils.io import read_video, synth_shaky_clip
    from video_stabilizer_tpu.utils.jitter import median_jitter_px
    if args.device_metric:
        from video_stabilizer_tpu.utils.flow import median_jitter_px_device
        median_jitter_px = median_jitter_px_device  # noqa: F811

    if args.video:
        frames = np.stack(list(read_video(args.video, args.frames)))
    else:
        h, w = (int(v) for v in args.size.split("x"))
        frames = synth_shaky_clip(args.frames, h, w, seed=3, jitter_px=1.0,
                                  pan_px_per_frame=0.3)
    t_n, height, width = frames.shape[:3]
    gray = np.asarray(
        np.round(0.114 * frames[..., 0] + 0.587 * frames[..., 1]
                 + 0.299 * frames[..., 2]), np.uint8) if frames.ndim == 4 else frames

    in_jitter = median_jitter_px(frames)
    print(f"input: {t_n} frames {width}x{height}, jitter {in_jitter:.3f}px")

    # The reference's grid (grid_search_align.cpp:135-146).
    thresholds = [0.01, 0.02, 0.04]
    fractions = [0.7, 0.8, 0.9]
    max_disps = [5.0, 10.0, 20.0]
    phase_opts = [False, True] if args.with_phase else [False]

    # The sampling windows support per-level displacements up to margin-2 px
    # (ops/patches.py); sweeping max_displacement beyond that would score
    # combos on silently clamped samples. Widen the coarse-level margin to
    # cover the largest sweep value (fine levels only refine sub-pixel after
    # the coarse init, so the fine margin stays at its default).
    need_margin = int(np.ceil(max(max_disps))) + 2
    base_aligner = AlignerParams()
    if need_margin > base_aligner.window_margin:
        print(f"widening window_margin {base_aligner.window_margin} -> "
              f"{need_margin} to cover max_displacement={max(max_disps)}")
        base_aligner = AlignerParams(window_margin=need_margin)

    combos = list(itertools.product(thresholds, fractions, max_disps))
    dyn_batch = DynAlignParams(
        threshold=jnp.asarray([c[0] for c in combos], jnp.float32),
        smallest_fraction=jnp.asarray([c[1] for c in combos], jnp.float32),
        max_displacement=jnp.asarray([c[2] for c in combos], jnp.float32),
    )

    # Stabilizer with smoother disabled: jitter == raw measurement
    # (stabilizer.cpp:59-64 branch B), crop like the reference's eval.
    stab_params = StabilizerParams(aligner=base_aligner,
                                   enable_smoother=False, crop_pixels=16)

    @functools.partial(jax.jit, static_argnames=("params",))
    def run_combos(gray_clip, bgr_clip, dyn, params):
        def one(d):
            meas, ok = align_clip_impl(gray_clip, params.aligner,
                                       width, height, dyn=d)
            accums = accumulate_corrections(meas, ok, meas, params,
                                            width, height)
            delayed = bgr_clip[: bgr_clip.shape[0] - params.lag]

            def warp_one(fr, acc):
                t_ul = T.center_to_ul(acc, width, height, minus_one=True)
                out = warp_image_fast(fr, t_ul)
                c = params.crop_pixels
                return out[c:-c, c:-c]

            outs = jax.lax.map(lambda a: warp_one(*a), (delayed, accums))
            return outs, meas, ok

        return jax.lax.map(one, dyn)  # sequential over combos (memory-safe)

    results = {}
    for phase in phase_opts:
        params = stab_params if not phase else StabilizerParams(
            aligner=dataclasses.replace(base_aligner, phase_correlate=True),
            enable_smoother=False, crop_pixels=16)
        t0 = time.time()
        outs, meas, ok = run_combos(jnp.asarray(gray), jnp.asarray(frames),
                                    dyn_batch, params)
        outs = np.asarray(outs)
        print(f"phase_correlate={phase}: {len(combos)} combos in "
              f"{time.time()-t0:.1f}s")
        for ci, (thr, frac, md) in enumerate(combos):
            out_j = median_jitter_px(outs[ci] if args.device_metric
                                     else list(outs[ci]))
            ratio = out_j / max(in_jitter, 1e-9)
            fail = int(np.sum(~np.asarray(ok[ci]))) - 1
            results[(phase, thr, frac, md)] = (ratio, fail)

    best = sorted(results.items(), key=lambda kv: kv[1][0])
    print("\n top 10 combos (out/in jitter ratio, align failures):")
    for (phase, thr, frac, md), (ratio, fail) in best[:10]:
        print(f"  ratio={ratio:.4f} fail={fail:2d}  phase={phase} "
              f"threshold={thr} fraction={frac} max_disp={md}")
    (phase, thr, frac, md), (ratio, fail) = best[0]
    print(f"\nbest: phase_correlate={phase} threshold={thr} "
          f"smallest_fraction={frac} max_displacement={md} "
          f"-> ratio {ratio:.4f}")


if __name__ == "__main__":
    main()
