"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest forces JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import pytest

from video_stabilizer_tpu.config import StabilizerParams
from video_stabilizer_tpu.models.batch import stabilize_streams
from video_stabilizer_tpu.parallel import (
    make_mesh,
    stabilize_streams_sharded,
)
from video_stabilizer_tpu.utils.io import synth_shaky_clip

H, W, N = 96, 128, 16


@pytest.fixture(scope="module")
def clips8():
    return np.stack([
        synth_shaky_clip(N, H, W, seed=100 + s, jitter_px=0.6,
                         pan_px_per_frame=0.2) for s in range(8)])


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_unsharded(clips8):
    mesh = make_mesh()
    params = StabilizerParams(crop_pixels=4)
    out_sh, meas_sh, ok_sh = stabilize_streams_sharded(clips8, mesh, params)
    out_un, meas_un, ok_un = stabilize_streams(clips8, params)
    np.testing.assert_array_equal(np.asarray(ok_sh), np.asarray(ok_un))
    # GSPMD partitioning reorders f32 reductions; the GN loop is iterative
    # with a 0.02px *step* stop criterion, so converged measurements can
    # legitimately differ by a few hundredths of a pixel. Compare at
    # convergence-noise scale; the u8 output check below is the strict one.
    np.testing.assert_allclose(np.asarray(meas_sh), np.asarray(meas_un),
                               atol=8e-2)
    diff = np.abs(np.asarray(out_sh, np.int32) - np.asarray(out_un, np.int32))
    assert np.mean(diff <= 1) > 0.995


def test_output_sharding_preserved(clips8):
    mesh = make_mesh()
    out, meas, ok = stabilize_streams_sharded(
        clips8, mesh, StabilizerParams(crop_pixels=4))
    # Output stays sharded over streams — no implicit all-gather.
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(1,) + out.shape[1:]}


def test_indivisible_stream_count_raises(clips8):
    mesh = make_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        stabilize_streams_sharded(clips8[:3], mesh)


def test_sharded_chunked_matches_unsharded(clips8):
    """The flagship serving path over the mesh: sharded chunked == unsharded
    chunked (which test_chunked.py pins == unchunked clip), with the carried
    StreamState staying sharded across chunks."""
    from video_stabilizer_tpu.models.chunked import stabilize_stream_chunked
    from video_stabilizer_tpu.parallel import (
        init_sharded_stream_states, stabilize_chunk_streams_sharded)

    mesh = make_mesh()
    params = StabilizerParams(lag=4, smoother_memory=2, crop_pixels=4)
    s, t = clips8.shape[0], clips8.shape[1]
    chunk = t // 2
    states = init_sharded_stream_states(s, W, H, params, mesh)
    outs, valids, meass, oks = [], [], [], []
    for k in range(0, t, chunk):
        states, out, meas, ok, valid = stabilize_chunk_streams_sharded(
            states, clips8[:, k:k + chunk], mesh, params)
        # State stays sharded across chunks — no implicit all-gather.
        shard_shapes = {sh.data.shape
                        for sh in states.accum.addressable_shards}
        assert shard_shapes == {(1, 4)}
        outs.append(np.asarray(out))
        valids.append(np.asarray(valid))
        meass.append(np.asarray(meas))
        oks.append(np.asarray(ok))
    out_sh = np.concatenate(outs, axis=1)
    valid = np.concatenate(valids, axis=1)
    meas_sh = np.concatenate(meass, axis=1)
    ok_sh = np.concatenate(oks, axis=1)

    for si in range(s):
        out_un, meas_un, ok_un = stabilize_stream_chunked(
            clips8[si], params, chunk_size=chunk)
        np.testing.assert_array_equal(ok_sh[si], ok_un)
        np.testing.assert_allclose(meas_sh[si], meas_un, atol=8e-2)
        got = out_sh[si][valid[si]]
        diff = np.abs(got.astype(np.int32) - out_un.astype(np.int32))
        assert np.mean(diff <= 1) > 0.995, (si, np.mean(diff <= 1))


COLLECTIVE_HLO_OPS = ("all-reduce", "all-gather", "all-to-all",
                      "collective-permute", "collective-broadcast",
                      "reduce-scatter", "ragged-all-to-all")


def test_sharded_chunk_program_has_zero_collectives(clips8):
    """Structural pin of the zero-collective claim (SURVEY §2.5 comm-backend
    row): the COMPILED sharded chunk program contains no collective HLO ops,
    so per-stream independence holds by construction, not just statistically
    on an 8-sample mesh. This is the guard check_vma=False forgoes
    (parallel/mesh.py) — a future accidental cross-shard dependency would
    surface here as an inserted collective."""
    from video_stabilizer_tpu.parallel import init_sharded_stream_states
    from video_stabilizer_tpu.parallel.mesh import (
        STREAM_AXIS, _stabilize_chunk_streams_sharded_jit, shard_streams)

    mesh = make_mesh()
    params = StabilizerParams(lag=4, smoother_memory=2, crop_pixels=4)
    states = init_sharded_stream_states(8, W, H, params, mesh)
    frames = shard_streams(jax.numpy.asarray(clips8[:, :4]), mesh)
    compiled = _stabilize_chunk_streams_sharded_jit.lower(
        states, frames, params, W, H, "similarity", mesh,
        STREAM_AXIS).compile()
    hlo = compiled.as_text()
    for op in COLLECTIVE_HLO_OPS:
        assert op not in hlo, f"collective {op!r} in sharded chunk program"


def test_sharded_clip_program_has_zero_collectives(clips8):
    """Same structural pin for the GSPMD-partitioned batch path: the
    partitioner must not insert any cross-device communication."""
    from video_stabilizer_tpu.parallel.mesh import (
        STREAM_AXIS, _stabilize_sharded_jit, shard_streams)

    mesh = make_mesh()
    params = StabilizerParams(crop_pixels=4)
    frames = shard_streams(jax.numpy.asarray(clips8), mesh)
    compiled = _stabilize_sharded_jit.lower(
        frames, params, W, H, mesh, STREAM_AXIS).compile()
    hlo = compiled.as_text()
    for op in COLLECTIVE_HLO_OPS:
        assert op not in hlo, f"collective {op!r} in sharded clip program"


def test_multihost_recipe_single_process():
    """The multi-host ingest recipe degenerates correctly to one process on
    the virtual 8-device mesh: global batch assembly from 'local' streams,
    sharded stabilization, outputs matching the device_put path."""
    import jax
    import numpy as np

    from video_stabilizer_tpu.config import StabilizerParams
    from video_stabilizer_tpu.parallel import (
        local_stream_slice, make_global_stream_batch, multihost_mesh,
        stabilize_streams_sharded)
    from video_stabilizer_tpu.utils.io import synth_shaky_clip

    mesh = multihost_mesh()
    assert mesh.devices.size == 8
    sl = local_stream_slice(8)
    assert (sl.start, sl.stop) == (0, 8)   # single process feeds everything

    clips = np.stack([
        synth_shaky_clip(8, 48, 64, seed=80 + s, jitter_px=0.5)
        for s in range(8)])
    params = StabilizerParams(lag=2, smoother_memory=1, crop_pixels=4)
    batch = make_global_stream_batch(clips[sl], mesh, 8)
    assert batch.shape == clips.shape
    out, meas, ok = stabilize_streams_sharded(batch, mesh, params)
    out2, meas2, ok2 = stabilize_streams_sharded(clips, mesh, params)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
