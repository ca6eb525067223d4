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


def summarize_by_source(logdir, top: int = 30):
    """Aggregate TPU op time by repo source line (the `source` stat XLA
    attaches to each op's metadata) — answers "which line of OUR code is
    this fusion soup" directly instead of eyeballing HLO names. Async
    copy/slice spans are excluded (they overlap compute; their wall cost
    shows up in the ops that wait on them)."""
    import glob as _glob
    paths = sorted(_glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane found", file=sys.stderr)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        smeta = plane.stat_metadata
        src_of = {}
        for mid, em in meta.items():
            name = em.name
            if ("copy-start" in name or "slice-start" in name
                    or "copy-done" in name or "slice-done" in name
                    or name.startswith("%while")):
                continue
            src = None
            for st in em.stats:
                key = smeta[st.metadata_id].name if st.metadata_id in smeta \
                    else ""
                if key == "source":
                    v = st.str_value or (st.ref_value
                                         and smeta[st.ref_value].name) or ""
                    src = v.split("/")[-1] if v else None
            src_of[mid] = src or "<no source>"
        totals, counts = {}, {}
        for line in plane.lines:
            if line.name not in ("XLA Ops",) and "Ops" not in line.name:
                continue
            for ev in line.events:
                if ev.metadata_id not in src_of:
                    continue
                s = src_of[ev.metadata_id]
                totals[s] = totals.get(s, 0) + ev.duration_ps
                counts[s] = counts.get(s, 0) + 1
        if not totals:
            continue
        grand = sum(totals.values())
        print(f"\n== {plane.name} by source line (sync ops only), "
              f"total {grand/1e12*1e3:.2f} ms ==")
        for s, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ps/1e12*1e3:9.3f} ms  {100.0*ps/grand:5.1f}%  "
                  f"x{counts[s]:<6d} {s[:100]}")


def summarize_xplane(logdir, top: int = 40):
    """Parse the newest xplane.pb under logdir into per-op total times.

    Reads the XSpace proto directly (tensorflow.tsl.profiler xplane_pb2)
    and aggregates XLA-op event durations on the TPU device plane — the
    tensorboard_plugin_profile converter in this image is ABI-mismatched
    with both its pywrap (missing xspace_to_tools_data) and upb protobufs,
    so the raw proto walk is the only working route here. Run with
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (pure-python protobuf;
    the upb fast path rejects the plugin's stale generated code).
    """
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane found", file=sys.stderr)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        totals, counts = {}, {}
        for line in plane.lines:
            # Line 0 ("XLA Ops") carries the per-op schedule; deeper lines
            # repeat the same spans under module/fusion grouping.
            if line.name not in ("XLA Ops", "XLA TraceMe", "Steps"):
                if "Ops" not in line.name and line.id != 0:
                    continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                totals[name] = totals.get(name, 0) + ev.duration_ps
                counts[name] = counts.get(name, 0) + 1
        if not totals:
            continue
        grand = sum(totals.values())
        print(f"\n== {plane.name}: {len(totals)} distinct ops, "
              f"total {grand/1e12*1e3:.2f} ms ==")
        for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ps/1e12*1e3:9.3f} ms  {100.0*ps/grand:5.1f}%  "
                  f"x{counts[name]:<5d} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--logdir", default="/tmp/vidstab_trace")
    ap.add_argument("--mode", choices=["1080p", "4k"], default="1080p",
                    help="4k = config-4 (homography + phase + lanczos2)")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip the TPU run; summarize an existing trace")
    ap.add_argument("--by-source", action="store_true",
                    help="aggregate by repo source line instead of HLO op")
    args = ap.parse_args()

    if args.parse_only:
        (summarize_by_source if args.by_source
         else summarize_xplane)(args.logdir)
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_stabilizer_tpu.config import AlignerParams, StabilizerParams
    from video_stabilizer_tpu.models.chunked import (
        _stabilize_chunk_streams_jit, init_stream_state)
    from video_stabilizer_tpu.utils.io import synth_shaky_clip

    if args.mode == "4k":
        h, w = 2160, 3840
        params = StabilizerParams(
            aligner=AlignerParams(phase_correlate=True),
            output_interp="lanczos2", crop_pixels=32)
        model = "homography"
    else:
        h, w = 1080, 1920
        params = StabilizerParams(crop_pixels=32)
        model = "similarity"
    clip = synth_shaky_clip(args.frames, h, w, seed=5, jitter_px=1.0,
                            pan_px_per_frame=0.3)
    clips = jnp.asarray(
        np.broadcast_to(clip, (args.streams,) + clip.shape).copy())
    if args.mode == "4k":
        states = jax.vmap(
            lambda _: init_stream_state(w, h, params, 3, "homography"))(
                jnp.arange(args.streams))
    else:
        states = jax.vmap(lambda _: init_stream_state(w, h, params))(
            jnp.arange(args.streams))

    def run(states, x):
        states, out, meas, ok, valid = _stabilize_chunk_streams_jit(
            states, x, params, w, h, model)
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
