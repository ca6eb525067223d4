"""AlignerParams construction-time validation (round-4 hygiene).

merge_coarse silently no-oped when combined with selection="topk",
fixed_iters or gn_kernel="pallas" (round-3 verdict weak item 3); the
VIDSTAB_GN_BODY env knob could silently trigger a >20-minute Mosaic
compile (weak item 4); and the VIDSTAB_GN_MIN_BYTES env var was read at
trace time, so cached compiles ignored later changes (advisor finding).
All three are now explicit: invalid combinations raise at construction,
the env knob resolves ONCE into the static jit key, and the fused kernel
body is interpreter-only.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from video_stabilizer_tpu.config import AlignerParams


def test_bad_selection_raises():
    with pytest.raises(ValueError, match="selection"):
        AlignerParams(selection="nth_element")


def test_bad_gn_kernel_raises():
    with pytest.raises(ValueError, match="gn_kernel"):
        AlignerParams(gn_kernel="cuda")


@pytest.mark.parametrize("kwargs, match", [
    (dict(selection="topk"), "selection='mask'"),
    (dict(fixed_iters=4), "fixed_iters"),
    (dict(gn_kernel="pallas"), "pallas"),
])
def test_merge_coarse_refuses_silent_noop_combos(kwargs, match):
    with pytest.raises(ValueError, match=match):
        AlignerParams(merge_coarse=2, **kwargs)


def test_merge_coarse_valid_combos_construct():
    AlignerParams(merge_coarse=2)
    AlignerParams(merge_coarse=2, gn_kernel="auto")
    AlignerParams(merge_coarse=2, gn_kernel="xla")
    AlignerParams(merge_coarse=1, selection="topk")  # < 2 is a documented no-op


def test_gn_min_bytes_resolves_from_env_once(monkeypatch):
    monkeypatch.setenv("VIDSTAB_GN_MIN_BYTES", "12345")
    p = AlignerParams()
    assert p.gn_min_bytes == 12345
    # Later env changes do NOT retroactively change constructed params
    # (the resolved value is part of the static jit key).
    monkeypatch.setenv("VIDSTAB_GN_MIN_BYTES", "777")
    assert p.gn_min_bytes == 12345
    assert AlignerParams().gn_min_bytes == 777


def test_gn_min_bytes_malformed_env_raises_at_construction(monkeypatch):
    monkeypatch.setenv("VIDSTAB_GN_MIN_BYTES", "2MB")
    with pytest.raises(ValueError, match="VIDSTAB_GN_MIN_BYTES"):
        AlignerParams()


def test_gn_min_bytes_explicit_overrides_env(monkeypatch):
    monkeypatch.setenv("VIDSTAB_GN_MIN_BYTES", "12345")
    assert AlignerParams(gn_min_bytes=999).gn_min_bytes == 999


def test_fused_gn_body_refuses_real_tpu_compile():
    """body_mode='fused' must be interpreter-only (its Mosaic compile was
    observed to run >20 minutes — docs/ROADMAP.md ledger)."""
    from video_stabilizer_tpu.ops.pallas_gn import gn_solve_pallas

    n, p = 128, 8
    kwargs = dict(
        windows=jnp.zeros((p, p, n), jnp.bfloat16),
        tmpl=jnp.zeros((2, n)), jac_masked=jnp.zeros((4, 2, n)),
        hinv=jnp.eye(4), fx=jnp.zeros((2, n)), fy=jnp.zeros((2, n)),
        ox=jnp.zeros((n,)), oy=jnp.zeros((n,)),
        t_init=jnp.zeros((4,)), threshold=jnp.float32(0.02),
        width=64, height=48, max_iters=4,
        corners=((0.0, 0.0), (63.0, 0.0), (0.0, 47.0), (63.0, 47.0)))
    with pytest.raises(ValueError, match="interpreter-only"):
        gn_solve_pallas(**kwargs, interpret=False, body_mode="fused")
    with pytest.raises(ValueError, match="body_mode"):
        gn_solve_pallas(**kwargs, interpret=True, body_mode="bogus")
    # The interpreter-mode fused body stays allowed (numerics experiments).
    t, conv, disp, iters = gn_solve_pallas(**kwargs, interpret=True,
                                           body_mode="fused")
    assert np.asarray(t).shape == (4,)
