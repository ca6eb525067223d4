"""Long-duration serving soak (round-3 verdict item 9).

The chunked serving state (models/chunked.StreamState) carries f32
accumulators, a measurement ring and frame tails across UNBOUNDED chunks —
the reference's serve loop runs for hours (stabilizer.cpp:9-117). Nothing
short pins hour-scale behavior, so this soak drives 5,000 two-frame chunks
(10,000 frames) through one stream at small resolution and asserts:

  - bounded state: the accumulated correction stays within the decay
    envelope and every state leaf stays finite at sampled checkpoints;
  - no counter pathology: steps_seen/pairs_seen advance exactly;
  - late-offset equivalence: the last outputs match the STREAMING
    stabilizer (models/stabilizer.VideoStabilizer, host f64 algebra) run
    over the same 10,000 frames, within the f32/f64 accumulation-drift
    band the short equivalence tests already allow;
  - sustained jitter reduction in the final stretch.

Opt-in like the TPU suite (minutes of runtime):  pytest -m soak
A recorded green run lives in docs/SOAK_RUN.md.
"""

import numpy as np
import pytest

from video_stabilizer_tpu.config import StabilizerParams
from video_stabilizer_tpu.models import VideoStabilizer
from video_stabilizer_tpu.models.chunked import (
    _stabilize_chunk_jit,
    init_stream_state,
)

pytestmark = pytest.mark.soak

H, W = 48, 64
N_CHUNKS = 5000
T = 2 * N_CHUNKS


def _soak_frames():
    """10,000 deterministic shaky frames. Generated in bounded-pan SEGMENTS
    (synth_shaky_clip's canvas grows with pan * num_frames) whose content
    jumps at segment boundaries — the aligner sees those as scene cuts,
    which a long-running serve loop must survive anyway."""
    from video_stabilizer_tpu.utils.io import synth_shaky_clip

    segs = [synth_shaky_clip(1000, H, W, seed=1000 + k, jitter_px=0.6,
                             pan_px_per_frame=0.1) for k in range(T // 1000)]
    return np.concatenate(segs, axis=0)


def test_serving_soak_5k_chunks():
    params = StabilizerParams(lag=4, smoother_memory=2, crop_pixels=4)
    frames = _soak_frames()

    # ---- chunked serving: 5,000 sequential 2-frame chunk calls ----
    state = init_stream_state(W, H, params, 3)
    outs_tail = []          # last K outputs (bounded memory)
    keep = 128
    accum_norms = []
    for k in range(N_CHUNKS):
        chunk = frames[2 * k:2 * k + 2]
        state, out, meas, ok, valid = _stabilize_chunk_jit(
            state, chunk, params, W, H)
        if k % 500 == 0 or k == N_CHUNKS - 1:
            # Bounded, finite state at sampled checkpoints.
            accum = np.asarray(state.accum)
            assert np.all(np.isfinite(accum)), (k, accum)
            accum_norms.append(float(np.linalg.norm(accum)))
            assert np.all(np.isfinite(np.asarray(state.meas_tail))), k
        out = np.asarray(out)
        v = np.asarray(valid)
        outs_tail.extend(list(out[v]))
        outs_tail = outs_tail[-keep:]
    assert int(state.steps_seen) == T
    assert int(state.pairs_seen) == N_CHUNKS
    # The decay envelope keeps the accumulated correction's displacement
    # bounded; at this resolution that means a small parameter norm (the
    # TX/TY entries are pixels: |accum| far below the max_disp=64 bound).
    assert max(accum_norms) < 64.0, accum_norms

    # ---- streaming reference over the same 10,000 frames ----
    stab = VideoStabilizer(params)
    stream_tail = []
    for f in frames:
        o = stab.process_frame(f)
        if o is not None:
            stream_tail.append(np.asarray(o))
            stream_tail = stream_tail[-keep:]

    # Late-offset spot equivalence: chunked == streaming at the END of the
    # 10k-frame run (u8 scale; the backends differ by f32-vs-f64 host
    # accumulation order, same band as the short equivalence tests).
    a = np.stack(outs_tail)
    b = np.stack(stream_tail)
    assert a.shape == b.shape
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    frac = float(np.mean(diff <= 1))
    assert frac > 0.99, frac

    # Sustained jitter reduction at the end of the run.
    from video_stabilizer_tpu.utils.jitter import median_jitter_px

    in_j = median_jitter_px(list(frames[-keep:]))
    out_j = median_jitter_px(list(a))
    assert out_j < 0.6 * in_j, (in_j, out_j)
