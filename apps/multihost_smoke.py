"""Two-process jax.distributed smoke test of parallel/multihost.py (CPU).

Executes the multi-host recipe for real — coordinator bring-up, per-host
ingest of only the local streams, global-array assembly, sharded
stabilization — with 2 processes x 4 virtual CPU devices standing in for
2 hosts x 4 chips (no multi-host TPU slice exists in this environment).

Run from the repo root:

    python apps/multihost_smoke.py            # launcher: spawns 2 workers

Each worker initializes jax.distributed against a localhost coordinator,
sees the global 8-device set, feeds its own 4-stream slice, and runs the
SAME jitted sharded program (SPMD). Worker 0 fetches its local output
shards and checks them against the single-process pipeline.

Recorded output: docs/MULTIHOST_SMOKE.md. Reference context: the reference
is single-process (SURVEY.md §2.5) — this is the TPU-native scale-out path.
"""

import os
import subprocess
import sys

PORT = 12356
N_PROC = 2
DEV_PER_PROC = 4
S_TOTAL = 8  # one stream per global device


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{xla_flags} "
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    from video_stabilizer_tpu.parallel import (
        initialize_multihost,
        local_stream_slice,
        make_global_stream_batch,
        multihost_mesh,
        stabilize_streams_sharded,
    )

    initialize_multihost(coordinator_address=f"localhost:{PORT}",
                         num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.device_count() == N_PROC * DEV_PER_PROC
    assert jax.local_device_count() == DEV_PER_PROC

    import numpy as np

    from video_stabilizer_tpu.config import StabilizerParams
    from video_stabilizer_tpu.utils.io import synth_shaky_clip

    params = StabilizerParams(lag=2, smoother_memory=1, crop_pixels=4)
    # Deterministic global content: every process could synthesize every
    # stream, but each feeds ONLY its local slice (the DCN-locality rule).
    clips = np.stack([
        synth_shaky_clip(8, 48, 64, seed=90 + s, jitter_px=0.5)
        for s in range(S_TOTAL)])

    mesh = multihost_mesh()
    sl = local_stream_slice(S_TOTAL)
    assert (sl.stop - sl.start) == S_TOTAL // N_PROC
    batch = make_global_stream_batch(clips[sl], mesh, S_TOTAL)
    assert batch.shape == clips.shape

    out, meas, ok = stabilize_streams_sharded(batch, mesh, params)
    jax.block_until_ready((out, meas, ok))

    # Every process validates its LOCAL output shards against the
    # single-process pipeline run on the same streams.
    from video_stabilizer_tpu.models.batch import stabilize_clip

    for shard in out.addressable_shards:
        s_idx = shard.index[0].start
        ref, _, _ = stabilize_clip(clips[s_idx], params)
        np.testing.assert_array_equal(np.asarray(shard.data)[0],
                                      np.asarray(ref))
    print(f"[proc {pid}] OK: {jax.process_count()} processes, "
          f"{jax.device_count()} global devices, out {out.shape}, "
          f"local shards "
          f"{sorted(sh.index[0].start for sh in out.addressable_shards)} "
          f"match single-process pipeline", flush=True)


def main() -> None:
    env = dict(os.environ)
    procs = [
        subprocess.Popen([sys.executable, __file__, "--worker", str(pid)],
                         env=env)
        for pid in range(N_PROC)
    ]
    codes = [p.wait(timeout=1200) for p in procs]
    if any(codes):
        sys.exit(f"worker exit codes: {codes}")
    print(f"multihost smoke OK: {N_PROC} processes x {DEV_PER_PROC} devices")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        main()
