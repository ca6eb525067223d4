"""Native host-runtime (framepipe) tests: build, buffer pool, staging queue,
BGR->gray parity, Y4M round trip."""

import os

import numpy as np
import pytest

from video_stabilizer_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++/native build unavailable")


def test_bgr_to_gray_matches_python(rng):
    bgr = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    got = native.bgr_to_gray(bgr)
    f = bgr.astype(np.float64)
    want = np.round(0.114 * f[..., 0] + 0.587 * f[..., 1] + 0.299 * f[..., 2])
    assert np.mean(np.abs(got.astype(int) - want.astype(int)) <= 1) == 1.0
    assert np.mean(got.astype(int) == want.astype(int)) > 0.99


def test_batch_stager_round_trip(rng):
    h, w, t = 48, 64, 4
    stager = native.BatchStager(h, w, batch_frames=t, n_slabs=2, n_workers=2)
    try:
        frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                  for _ in range(2 * t)]
        for f in frames[:t]:
            stager.submit(f)
        batch = stager.pop()
        assert batch.shape == (t, h, w, 3)
        for i in range(t):
            np.testing.assert_array_equal(batch[i], frames[i])
        # Second batch reuses a slab.
        for f in frames[t:]:
            stager.submit(f)
        batch2 = stager.pop()
        for i in range(t):
            np.testing.assert_array_equal(batch2[i], frames[t + i])
        stager.recycle(batch)
        stager.recycle(batch2)
    finally:
        stager.close()


def test_batch_stager_strided_source(rng):
    h, w, t = 16, 24, 2
    stager = native.BatchStager(h, w, batch_frames=t, n_slabs=2)
    try:
        big = rng.integers(0, 256, (h, w * 2, 3), dtype=np.uint8)
        view = big[:, :w]  # non-contiguous rows
        stager.submit(view)
        stager.submit(view)
        batch = stager.pop()
        np.testing.assert_array_equal(batch[0], np.ascontiguousarray(view))
        stager.recycle(batch)
    finally:
        stager.close()


def _write_y4m(path, frames_yuv, w, h, cspace="420jpeg"):
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C{cspace}\n".encode())
        for (y, u, v) in frames_yuv:
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def test_y4m_gray_and_bgr(tmp_path, rng):
    w, h, n = 32, 24, 3
    frames = []
    for _ in range(n):
        y = rng.integers(16, 235, (h, w), dtype=np.uint8)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        frames.append((y, u, v))
    path = str(tmp_path / "clip.y4m")
    _write_y4m(path, frames, w, h)

    r = native.Y4MReader(path)
    assert (r.width, r.height) == (w, h)
    grays = list(r.frames_gray())
    assert len(grays) == n
    for g, (y, _, _) in zip(grays, frames):
        np.testing.assert_array_equal(g, y)
    r.close()

    # Neutral chroma -> BGR == gray in all channels (BT.601).
    r2 = native.Y4MReader(path)
    bgrs = list(r2.frames_bgr())
    assert len(bgrs) == n
    for b, (y, _, _) in zip(bgrs, frames):
        for c in range(3):
            np.testing.assert_allclose(b[..., c].astype(int), y.astype(int),
                                       atol=1)
    r2.close()


def test_pool_exhaustion_and_release():
    lib = native.load()
    pool = lib.fp_pool_create(1024, 2)
    a = lib.fp_pool_acquire(pool)
    b = lib.fp_pool_acquire(pool)
    assert a and b
    assert lib.fp_pool_acquire(pool) is None  # exhausted
    lib.fp_pool_release(pool, a)
    assert lib.fp_pool_available(pool) == 1
    lib.fp_pool_destroy(pool)
