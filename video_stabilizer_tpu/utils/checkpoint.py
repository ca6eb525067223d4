"""Checkpoint / resume for streaming stabilization state.

The reference has no checkpointing at all (SURVEY.md §5: all state lives in
in-memory deques). For long-running multi-stream serving this provides
save/restore of the full streaming state — aligner pytree (pyramids,
keyframe data, windows), the smoother ring, the measurement/frame queues,
and the accumulator — as a single .npz. Pure numpy on disk; no orbax
dependency (works identically on CPU and TPU hosts).
"""

from __future__ import annotations

import json

import jax
import numpy as np


def _flatten_state(state):
    leaves, treedef = jax.tree.flatten(state)
    return leaves, treedef


def _to_numpy(leaf):
    """bfloat16 has no native numpy representation everywhere — store as
    float32 (exact superset) and restore via jnp."""
    arr = np.asarray(leaf)
    if arr.dtype.name == "bfloat16":
        arr = arr.astype(np.float32)
    return arr


def _from_numpy(arr, template_leaf):
    import jax.numpy as jnp

    return jnp.asarray(arr).astype(template_leaf.dtype)


def save_aligner_state(path: str, state) -> None:
    leaves, _ = _flatten_state(state)
    np.savez_compressed(path, n=len(leaves),
                        **{f"leaf_{i}": _to_numpy(l)
                           for i, l in enumerate(leaves)})


def load_aligner_state(path: str, template_state):
    """Restore into the pytree structure of ``template_state`` (from
    models.aligner.init_state with the same resolution/params)."""
    data = np.load(path)
    leaves, treedef = _flatten_state(template_state)
    n = int(data["n"])
    if n != len(leaves):
        raise ValueError(
            f"checkpoint has {n} leaves; current state wants {len(leaves)} "
            "(resolution or params mismatch)")
    new_leaves = []
    for i, tmpl in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != tuple(tmpl.shape):
            raise ValueError(f"leaf {i} shape {arr.shape} != {tmpl.shape}")
        new_leaves.append(_from_numpy(arr, tmpl))
    return jax.tree.unflatten(treedef, new_leaves)


def save_stabilizer(path: str, stab) -> None:
    """Serialize a models.stabilizer.VideoStabilizer mid-stream."""
    payload = {
        "meta": np.frombuffer(json.dumps({
            "frame_index": stab.frame_index,
            "align_failures": stab.align_failures,
            "smoother_total": stab.smoother._total,
            "smoother_next": stab.smoother._next_to_finalize,
            "aligner_shape": list(stab.aligner._shape or []),
        }).encode(), dtype=np.uint8),
        "accum": stab._accum,
        "meas": np.asarray(list(stab._meas), np.float64).reshape(-1, 4)
        if stab._meas else np.zeros((0, 4)),
        "smoother_buf": stab.smoother._buf,
    }
    for i, f in enumerate(stab._frames):
        payload[f"frame_{i}"] = np.asarray(f)
    if stab.aligner._state is not None:
        leaves, _ = _flatten_state(stab.aligner._state)
        payload["n_leaves"] = np.asarray(len(leaves))
        for i, l in enumerate(leaves):
            payload[f"leaf_{i}"] = _to_numpy(l)
    np.savez_compressed(path, **payload)


def load_stabilizer(path: str, params=None):
    """Reconstruct a VideoStabilizer from a checkpoint; resumes mid-stream
    with identical subsequent outputs (see test_checkpoint.py)."""
    import collections

    import jax.numpy as jnp

    from video_stabilizer_tpu.config import StabilizerParams
    from video_stabilizer_tpu.models.aligner import init_state
    from video_stabilizer_tpu.models.stabilizer import VideoStabilizer

    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    stab = VideoStabilizer(params or StabilizerParams())
    stab.frame_index = meta["frame_index"]
    stab.align_failures = meta["align_failures"]
    stab._accum = np.asarray(data["accum"], np.float64)
    stab._meas = collections.deque(np.asarray(data["meas"], np.float64))
    stab.smoother._total = meta["smoother_total"]
    stab.smoother._next_to_finalize = meta["smoother_next"]
    stab.smoother._buf = np.asarray(data["smoother_buf"], np.float64)
    i = 0
    frames = []
    while f"frame_{i}" in data:
        frames.append(jnp.asarray(data[f"frame_{i}"]))
        i += 1
    stab._frames = collections.deque(frames)
    if "n_leaves" in data and meta["aligner_shape"]:
        h, w = meta["aligner_shape"]
        template = init_state(w, h, stab.params.aligner)
        leaves, treedef = _flatten_state(template)
        new_leaves = [_from_numpy(data[f"leaf_{k}"], leaves[k])
                      for k in range(int(data["n_leaves"]))]
        stab.aligner._state = jax.tree.unflatten(treedef, new_leaves)
        stab.aligner._shape = (h, w)
    return stab
