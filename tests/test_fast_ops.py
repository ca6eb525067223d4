"""Tests for the TPU fast-path ops against their reference-semantic oracles:
Jacobi eigh vs numpy, histogram selection vs exact counts, window-based
sampling vs the gather-based kernel."""

import numpy as np
import jax.numpy as jnp

from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.ops.linalg import eigh_sym4, regularized_pinv_sym4
from video_stabilizer_tpu.ops.patches import (
    extract_tile_windows,
    sample_windows,
    warp_rel_positions,
    window_origins,
    window_size,
)
from video_stabilizer_tpu.ops.select import histogram_mask, topk_mask
from video_stabilizer_tpu.ops.sparse import sparse_warp_sample
from conftest import make_test_image


def rand_spd(seed, scale=1.0):
    r = np.random.default_rng(seed)
    A = r.standard_normal((4, 4))
    return (A @ A.T * scale).astype(np.float32)


def test_eigh_sym4_matches_numpy():
    for seed in range(8):
        H = rand_spd(seed, scale=10.0 ** (seed - 3))
        w, V = eigh_sym4(jnp.asarray(H))
        w, V = np.asarray(w, np.float64), np.asarray(V, np.float64)
        # Reconstruction.
        rec = V @ np.diag(w) @ V.T
        np.testing.assert_allclose(rec, H, rtol=1e-4, atol=1e-5 * np.abs(H).max())
        # Eigenvalues match numpy (sorted).
        want = np.linalg.eigvalsh(H.astype(np.float64))
        np.testing.assert_allclose(np.sort(w), want, rtol=1e-4,
                                   atol=1e-5 * np.abs(want).max())


def test_eigh_sym4_diagonal_and_degenerate():
    w, V = eigh_sym4(jnp.diag(jnp.asarray([4.0, 3.0, 2.0, 1.0])))
    np.testing.assert_allclose(np.sort(np.asarray(w)), [1, 2, 3, 4], atol=1e-5)
    # Zero matrix.
    w, V = eigh_sym4(jnp.zeros((4, 4)))
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-7)
    # Identity eigenvectors stay orthonormal.
    np.testing.assert_allclose(np.asarray(V @ V.T), np.eye(4), atol=1e-5)


def test_regularized_pinv_well_conditioned():
    H = rand_spd(3) + np.eye(4, dtype=np.float32)
    Hinv = np.asarray(regularized_pinv_sym4(jnp.asarray(H)), np.float64)
    np.testing.assert_allclose(Hinv @ H, np.eye(4), atol=1e-3)


def test_regularized_pinv_singular():
    # Rank-deficient: pinv zeroes the null space, no NaN/inf.
    v = np.asarray([[1.0, 2.0, 3.0, 4.0]], np.float32)
    H = v.T @ v
    Hinv = np.asarray(regularized_pinv_sym4(jnp.asarray(H)))
    assert np.all(np.isfinite(Hinv))
    # Ill-conditioned: Tikhonov keeps the inverse bounded.
    H2 = H + 1e-9 * np.eye(4, dtype=np.float32)
    Hinv2 = np.asarray(regularized_pinv_sym4(jnp.asarray(H2)))
    assert np.all(np.isfinite(Hinv2))
    assert np.abs(Hinv2).max() < 1e9


def test_histogram_mask_counts():
    r = np.random.default_rng(5)
    wd = jnp.asarray(r.integers(0, 200, (40, 60)).astype(np.float32))
    for frac in (0.5, 0.8, 1.0):
        mask = np.asarray(histogram_mask(wd, frac))
        kept = mask.sum()
        # At least the requested count, at most count + ties in last bin.
        k = int(wd.size * frac)
        assert kept >= k
        tbin = np.floor(np.sort(np.asarray(wd).ravel())[k - 1])
        assert kept <= (np.asarray(wd) <= tbin).sum()


def test_histogram_mask_selects_smallest():
    wd = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10))
    mask = np.asarray(histogram_mask(wd, 0.3))
    assert mask.sum() == 30
    assert mask.ravel()[:30].all() and not mask.ravel()[30:].any()


def test_topk_mask_exact_count():
    r = np.random.default_rng(6)
    wd = jnp.asarray(r.uniform(0, 255, (30, 40)).astype(np.float32))
    mask = np.asarray(topk_mask(wd, 0.8))
    assert mask.sum() == int(wd.size * 0.8)
    # Kept entries are the smallest ones.
    thresh = np.sort(np.asarray(wd).ravel())[int(wd.size * 0.8) - 1]
    assert np.asarray(wd)[mask.astype(bool)].max() <= thresh + 1e-5


def test_window_sampling_matches_gather_kernel(test_image):
    tile, margin = 8, 8
    img = jnp.asarray(test_image)
    h, w = test_image.shape
    ht, wt = h // tile, w // tile
    windows = extract_tile_windows(img, tile, margin)
    assert windows.shape == (ht, wt, tile + 2 * margin, tile + 2 * margin)
    ox, oy = window_origins(ht, wt, tile, margin)

    # Keypoints: one per tile at pseudo-random in-tile offsets.
    r = np.random.default_rng(7)
    dx = r.integers(0, tile, (ht, wt))
    dy = r.integers(0, tile, (ht, wt))
    cx = np.arange(wt)[None, :] * tile + dx
    cy = np.arange(ht)[:, None] * tile + dy
    coords = jnp.asarray(np.stack([cx, cy], -1).astype(np.int32))

    t_center = T.make(0.01, -0.004, 2.0, -1.5)
    t_ul = T.center_to_ul(t_center, w, h, minus_one=False)

    p = window_size(tile, margin)
    rel_x, rel_y = warp_rel_positions(coords, t_ul, ox, oy, p)
    got = np.asarray(sample_windows(windows, rel_x, rel_y))
    want = np.asarray(sparse_warp_sample(img, coords, t_ul))

    # Interior points must match the gather kernel almost exactly (bf16
    # windows store u8 exactly; only accumulation order differs). Border
    # points may differ where the gather clamps to the image but the window
    # clamps to its interior — exclude a 1-tile frame.
    interior = np.zeros((ht, wt), bool)
    interior[1:-1, 1:-1] = True
    np.testing.assert_allclose(got[interior], want[interior], atol=0.05)
    # Border points still finite and close.
    assert np.all(np.isfinite(got))
    assert np.abs(got - want).max() < 16.0


def test_window_sampling_identity_reads_pixels(test_image):
    tile, margin = 8, 6
    img = jnp.asarray(test_image)
    h, w = test_image.shape
    ht, wt = h // tile, w // tile
    windows = extract_tile_windows(img, tile, margin)
    ox, oy = window_origins(ht, wt, tile, margin)
    cx = np.arange(wt)[None, :] * tile + 3
    cy = np.arange(ht)[:, None] * tile + 4
    coords = jnp.asarray(np.broadcast_to(
        np.stack([np.broadcast_to(cx, (ht, wt)),
                  np.broadcast_to(cy, (ht, wt))], -1), (ht, wt, 2)).astype(np.int32))
    p = window_size(tile, margin)
    rel_x, rel_y = warp_rel_positions(coords, T.identity(), ox, oy, p)
    got = np.asarray(sample_windows(windows, rel_x, rel_y))
    want = test_image[np.asarray(coords)[..., 1], np.asarray(coords)[..., 0]]
    np.testing.assert_allclose(got, want.astype(np.float64), atol=0.15)


def test_take_at_tile_argmax_batched_matches_per_set():
    """The stacked X/Y-set read (leading-axis broadcast) must equal two
    independent reads — both for one shared image at two index sets and
    for a stack of images each with its own indices."""
    from video_stabilizer_tpu.ops.argmax import grad_argmax, take_at_tile_argmax

    rng = np.random.default_rng(11)
    t = 6
    img = jnp.asarray(rng.integers(0, 256, (48, 60), dtype=np.uint8))
    gx = jnp.asarray(rng.normal(size=(48, 60)).astype(np.float32))
    gy = jnp.asarray(rng.normal(size=(48, 60)).astype(np.float32))
    idx_x, _, idx_y, _ = grad_argmax(gx, gy, t)

    # Shared image, stacked indices.
    both = np.asarray(take_at_tile_argmax(
        img, jnp.stack([idx_x, idx_y]), t))
    np.testing.assert_array_equal(
        both[0], np.asarray(take_at_tile_argmax(img, idx_x, t)))
    np.testing.assert_array_equal(
        both[1], np.asarray(take_at_tile_argmax(img, idx_y, t)))

    # Paired images and indices.
    paired = np.asarray(take_at_tile_argmax(
        jnp.stack([gx, gy]), jnp.stack([idx_x, idx_y]), t))
    np.testing.assert_array_equal(
        paired[0], np.asarray(take_at_tile_argmax(gx, idx_x, t)))
    np.testing.assert_array_equal(
        paired[1], np.asarray(take_at_tile_argmax(gy, idx_y, t)))


def test_gn_chunk_and_window_dtype_policy():
    """Static policy helpers: big-window levels get the 2-wide GN unroll
    and (off the Pallas path) u8 window storage; small levels keep the
    6-wide unroll."""
    from video_stabilizer_tpu.config import AlignerParams
    from video_stabilizer_tpu.models.aligner import (
        GN_CHUNK, LevelSpec, _window_store_dtype, gn_chunk_for)

    assert gn_chunk_for(32, 5184) == 2      # 1080p L0: 10.6 MB as-if-bf16
    assert gn_chunk_for(22, 1296) == GN_CHUNK   # 1080p L2: 1.25 MB
    # On CPU (no real-TPU backend) the auto Pallas path is off -> u8
    # storage everywhere.
    spec_big = LevelSpec(1920, 1080, 20, 96, 54, 6)
    spec_small = LevelSpec(480, 270, 10, 48, 27, 6)
    p = AlignerParams()
    assert _window_store_dtype(p, spec_big) == jnp.uint8
    assert _window_store_dtype(p, spec_small) == jnp.uint8
    # Forcing the Pallas kernel flips fitting levels to bf16 storage.
    p_pallas = AlignerParams(gn_kernel="pallas")
    assert _window_store_dtype(p_pallas, spec_small) == jnp.bfloat16
