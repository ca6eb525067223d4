"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths compile
and execute without TPU hardware. These env vars must be set before jax is
imported anywhere.
"""

import os

# Opt-in on-hardware mode (VIDSTAB_TPU=1 pytest -m tpu): leave the real TPU
# platform alone so the `tpu`-marked kernel regression tests exercise the
# actual Mosaic compile path (the default suite forces CPU and runs Pallas
# in interpreter mode, which can't catch Mosaic/layout regressions).
TPU_MODE = os.environ.get("VIDSTAB_TPU") == "1"

if not TPU_MODE:
    # Force-override: the environment may pre-set JAX_PLATFORMS to a TPU
    # plugin (e.g. "axon"); tests must run on the virtual CPU mesh
    # regardless.
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the pipeline programs take ~30-90s each to
# build on this box; cache them across pytest runs. TPU mode shares the
# bench cache (same chip, same programs).
#
# The CPU cache dir is keyed by a host-CPU-feature fingerprint: XLA:CPU
# stores AOT executables specialized to the compile machine's ISA, and
# its loader only WARNS on a feature mismatch ("could lead to execution
# errors such as SIGILL") — observed as a hard interpreter segfault in
# put_executable_and_time after this box was recycled onto different
# hardware. A box swap must land in a fresh cache dir.
def _host_fingerprint():
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split())).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine()


jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                                 "/tmp/jax_cache" if TPU_MODE
                                 else f"/tmp/jax_cache_tests_"
                                      f"{_host_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def make_test_image(height, width, seed=12345, smooth=2):
    """A smooth-ish random test image (u8) with structure at several scales.

    Pure-numpy separable box blurs over random noise, so kernels have real
    gradients to lock onto (the reference tests used a real photo at
    ../input.png; we synthesize an equivalent).
    """
    r = np.random.default_rng(seed)
    img = r.uniform(0, 255, size=(height, width)).astype(np.float64)
    for _ in range(smooth):
        acc = np.zeros_like(img)
        for s in (-2, -1, 0, 1, 2):
            acc += np.roll(img, s, axis=0) + np.roll(img, s, axis=1)
        img = acc / 10.0
    img = img - img.min()
    img = img / max(img.max(), 1e-9) * 255.0
    return img.astype(np.uint8)


def natural_image(height, width, seed=42):
    """A 1/f-spectrum multi-octave image with natural-image-like positive
    gradient autocorrelation.

    The LK scheme replicated from the reference evaluates keyframe gradients
    at *unwarped* keypoint coordinates (generators.cpp:346-385), so GN
    convergence requires the gradient autocorrelation to stay positive out
    to the full per-level displacement. Blurred white noise violates that
    beyond ~2px (oscillatory autocorrelation) and makes *both* the reference
    and this implementation diverge; natural imagery doesn't. Alignment
    tests therefore use this fixture.
    """
    r = np.random.default_rng(seed)
    img = np.zeros((height, width))
    for octave, amp in [(4, 1.0), (8, 2.0), (16, 4.0), (32, 8.0), (64, 16.0)]:
        small = r.uniform(-1, 1, (height // octave + 2, width // octave + 2))
        ups = np.kron(small, np.ones((octave, octave)))[: height + octave,
                                                        : width + octave]
        for ax in (0, 1):
            ups = np.cumsum(ups, axis=ax)
            ups = (np.roll(ups, -octave, axis=ax) - ups) / octave
        img += amp * ups[:height, :width]
    img -= img.min()
    img = img / max(img.max(), 1e-9) * 255.0
    return img.astype(np.uint8)


@pytest.fixture
def test_image():
    return make_test_image(96, 128)
