#!/usr/bin/env python
"""Capture a TPU profile of the chunked 1080p pipeline and print the
per-op time breakdown (the profile-driven tuning loop behind the
schedule-layer decisions recorded in code — SURVEY.md §2.2 analog).

Usage: python apps/profile_chunk.py [--streams 8] [--frames 16]
"""

import argparse
import glob
import gzip
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def summarize_xplane(logdir):
    """Parse the newest xplane.pb under logdir into per-op total times."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane found", file=sys.stderr)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {})
    import json
    # framework_op_stats returns JSON-ish; fall back to raw dump on surprise.
    try:
        rows = json.loads(data)
    except Exception:
        out = os.path.join(logdir, "op_stats_raw.txt")
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else str(data))
        print(f"wrote raw tool data to {out}", file=sys.stderr)
        return
    print(json.dumps(rows)[:4000])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--logdir", default="/tmp/vidstab_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_stabilizer_tpu.config import StabilizerParams
    from video_stabilizer_tpu.models.chunked import (
        _stabilize_chunk_streams_jit, init_stream_state)
    from video_stabilizer_tpu.utils.io import synth_shaky_clip

    h, w = 1080, 1920
    params = StabilizerParams(crop_pixels=32)
    clip = synth_shaky_clip(args.frames, h, w, seed=5, jitter_px=1.0,
                            pan_px_per_frame=0.3)
    clips = jnp.asarray(
        np.broadcast_to(clip, (args.streams,) + clip.shape).copy())
    states = jax.vmap(lambda _: init_stream_state(w, h, params))(
        jnp.arange(args.streams))

    def run(states, x):
        states, out, meas, ok, valid = _stabilize_chunk_streams_jit(
            states, x, params, w, h)
        return states, float(jnp.sum(out[:, -1, ::64, ::64]))

    t0 = time.time()
    states, _ = run(states, clips)
    print(f"warmup (incl. compile) {time.time()-t0:.1f}s", file=sys.stderr)
    states, _ = run(states, jnp.asarray(clips + np.uint8(1)))

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    t0 = time.time()
    states, _ = run(states, jnp.asarray(clips + np.uint8(2)))
    dt = time.time() - t0
    jax.profiler.stop_trace()
    n = args.streams * args.frames
    print(f"traced call: {dt:.3f}s for {n} frames "
          f"({n/dt:.1f} fps, {dt/n*1e3:.2f} ms/frame)", file=sys.stderr)
    summarize_xplane(args.logdir)


if __name__ == "__main__":
    main()
