"""Headline benchmark: stabilized 1080p BGR frames/sec on one TPU chip.

HONEST ACCOUNTING (round-2 rework, VERDICT item 2): uses the chunked
streaming-batch mode (models/chunked.py) with carried state, so every input
frame produces exactly one warped+cropped output frame in steady state —
no lag-window frames that skip the expensive output warp. Throughput =
(streams x chunk_frames) / chunk_time once the pipeline is past warm-up.

The north-star target is >500 fps (BASELINE.md); ``vs_baseline`` is
value/500 — the reference publishes no numbers of its own, so the target is
the baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # Persistent compile cache: the pipeline XLA program is large; don't
    # rebuild it every process.
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from video_stabilizer_tpu.config import AlignerParams, StabilizerParams
    from video_stabilizer_tpu.models.chunked import (
        _stabilize_chunk_streams_jit,
        init_stream_state,
    )
    from video_stabilizer_tpu.utils.io import synth_shaky_clip

    height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    width = int(os.environ.get("BENCH_WIDTH", "1920"))
    streams = int(os.environ.get("BENCH_STREAMS", "8"))
    frames = int(os.environ.get("BENCH_FRAMES", "16"))   # per chunk
    reps = int(os.environ.get("BENCH_REPS", "4"))

    # A/B knobs (BASELINE.md round-4 A/Bs); defaults = the shipped config.
    merge_coarse = int(os.environ.get("BENCH_MERGE_COARSE", "0"))
    pair_vmap = os.environ.get("BENCH_PAIR_VMAP", "0") != "0"
    params = StabilizerParams(
        crop_pixels=32,
        aligner=AlignerParams(merge_coarse=merge_coarse,
                              pair_vmap=pair_vmap))

    print(f"bench: {streams} streams x {frames}-frame chunks @ "
          f"{width}x{height} BGR on "
          f"{jax.devices()[0].platform}:{jax.devices()[0]}", file=sys.stderr)

    # One real synthetic stream (cheap to generate at reduced complexity),
    # tiled to S streams — content doesn't affect timing.
    clip = synth_shaky_clip(frames, height, width, seed=5, jitter_px=1.0,
                            pan_px_per_frame=0.3)
    clips = jnp.asarray(np.broadcast_to(clip, (streams,) + clip.shape).copy())

    states = jax.vmap(lambda _: init_stream_state(width, height, params))(
        jnp.arange(streams))

    # NOTE: on tunneled platforms block_until_ready() can be a no-op; only a
    # data fetch truly synchronizes. All timing boundaries below fetch a
    # scalar derived from the outputs.
    ok_rate = [0.0]

    def run_chunk(states, x):
        states, out, meas, ok, valid = _stabilize_chunk_streams_jit(
            states, x, params, width, height)
        return states, out, ok

    def sync(out, ok):
        ok_rate[0] = float(jnp.mean(ok))
        return float(jnp.sum(out[:, -1, ::64, ::64]))

    t0 = time.time()
    states, out, ok = run_chunk(states, clips)
    _ = sync(out, ok)
    print(f"bench: first call (incl. compile) {time.time() - t0:.1f}s",
          file=sys.stderr)

    # Distinct input per call (defeats any caching); several chunks per
    # timed rep to amortize the tunnel round-trip. State carries across all
    # calls — this IS the unbounded-stream serving loop. Within a rep the
    # chunks are submitted WITHOUT an intermediate host sync: successive
    # calls chain through the carried state on device (a serving loop never
    # blocks on frame data it doesn't read), with one scalar fetch per rep
    # as the timing boundary. A tiny device-side probe of every chunk's
    # output is accumulated so no output computation can be elided.
    inner = int(os.environ.get("BENCH_INNER", "4"))
    variants = [jnp.asarray(clips + np.uint8(k + 1)) for k in range(inner)]
    # Warm-up past the lag window so every timed output is a real warp.
    states, out, ok = run_chunk(states, variants[0])
    _ = sync(out, ok)
    times = []
    for _rep in range(reps):
        t0 = time.time()
        probe = None
        for v in variants:
            states, out, ok = run_chunk(states, v)
            p = jnp.sum(out[:, -1, ::64, ::64]) + jnp.sum(ok)
            probe = p if probe is None else probe + p
        _ = float(probe)  # one sync per rep
        ok_rate[0] = float(jnp.mean(ok))
        times.append((time.time() - t0) / inner)
    best = min(times)
    fps = streams * frames / best
    print(f"bench: steady-state {best:.3f}s per {streams * frames}-frame "
          f"chunk (1 warped output per input frame); "
          f"times={['%.3f' % t for t in times]}; "
          f"align success rate={ok_rate[0]:.3f}",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"stabilized_{height}p_bgr_fps_{streams}streams_chunked",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
