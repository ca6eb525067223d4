"""Headline benchmark: stabilized 1080p BGR frames/sec on one TPU chip.

Runs the full batched pipeline (align + TV-L1 smooth + accumulate + warp +
crop, all on device) over synthetic shaky 1080p streams and reports
steady-state throughput. The north-star target is >500 fps (BASELINE.md);
``vs_baseline`` is value/500 — the reference publishes no numbers of its
own, so the target is the baseline.

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
    from video_stabilizer_tpu.models.batch import _stabilize_streams_jit
    from video_stabilizer_tpu.utils.io import synth_shaky_clip

    height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    width = int(os.environ.get("BENCH_WIDTH", "1920"))
    streams = int(os.environ.get("BENCH_STREAMS", "8"))
    frames = int(os.environ.get("BENCH_FRAMES", "16"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    params = StabilizerParams(crop_pixels=32)

    print(f"bench: {streams}x{frames}x{height}x{width} BGR on "
          f"{jax.devices()[0].platform}:{jax.devices()[0]}", file=sys.stderr)

    rng = np.random.default_rng(0)
    # One real synthetic stream (cheap to generate at reduced complexity),
    # tiled to S streams — content doesn't affect timing.
    clip = synth_shaky_clip(frames, height, width, seed=5, jitter_px=1.0,
                            pan_px_per_frame=0.3)
    clips = jnp.asarray(np.broadcast_to(clip, (streams,) + clip.shape).copy())

    # NOTE: on tunneled platforms block_until_ready() can be a no-op; only a
    # data fetch truly synchronizes. All timing boundaries below fetch a
    # scalar derived from the outputs.
    ok_rate = [0.0]

    def run_and_sync(x):
        out, meas, ok = _stabilize_streams_jit(x, params, width, height)
        ok_rate[0] = float(jnp.mean(ok))
        return out, float(jnp.sum(out[:, -1, ::64, ::64]))

    t0 = time.time()
    out, _ = run_and_sync(clips)
    compile_and_first = time.time() - t0
    print(f"bench: first call (incl. compile) {compile_and_first:.1f}s",
          file=sys.stderr)

    # Distinct input per call (defeats any caching); several calls per timed
    # rep to amortize the tunnel round-trip.
    inner = int(os.environ.get("BENCH_INNER", "4"))
    variants = [jnp.asarray(clips + np.uint8(k)) for k in range(inner)]
    _ = run_and_sync(variants[-1])  # materialize variants on device
    times = []
    for _rep in range(reps):
        t0 = time.time()
        sink = 0.0
        for v in variants:
            out, s = run_and_sync(v)
            sink += s
        times.append((time.time() - t0) / inner)
    best = min(times)
    fps = streams * frames / best
    print(f"bench: steady-state {best:.3f}s for {streams * frames} frames; "
          f"times={['%.3f' % t for t in times]}; "
          f"align success rate={ok_rate[0]:.3f}",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"stabilized_{height}p_bgr_fps_{streams}streams",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
