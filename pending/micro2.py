"""Extraction-layout micro-bench: current flat extraction vs 4-axis einsum.

Current: einsum "aix,xm->aim" (m = q*wt + j) then reshape/transpose/merge —
the transpose after the matmul measured ~2 ms per keyframe at 1080p L0
(profile --by-source, patches.py:114). Variant B asks the dot to emit the
(a, q, i, j) axis order directly so the relayout can fuse into the matmul
output write.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_micro")

from video_stabilizer_tpu.ops.patches import (
    extract_tile_windows_flat, window_size)

H, W, TILE, MARGIN = 1080, 1920, 20, 6
S = 8
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 256, (S, H, W), dtype=np.uint8))


def extract_4axis(img, tile, margin, out_dtype=jnp.bfloat16):
    h, w = img.shape[-2], img.shape[-1]
    t = tile
    ht, wt = h // t, w // t
    p = window_size(t, margin)
    k = -(-p // t)
    padded = jnp.pad(img, ((margin, margin + t), (margin, margin + t)),
                     mode="edge")
    hp, wp = padded.shape
    rows = jnp.concatenate(
        [padded[s * t: s * t + ht * t, :].reshape(ht, t, wp)
         for s in range(k)], axis=1)
    x_mat = rows.transpose(1, 0, 2)[:p]            # (P, ht, Wp)
    xs = jnp.arange(wp, dtype=jnp.int32)[:, None, None]
    qs = jnp.arange(p, dtype=jnp.int32)[None, :, None]
    js = jnp.arange(wt, dtype=jnp.int32)[None, None, :]
    s_mat = (xs == js * t + qs).astype(jnp.bfloat16)   # (Wp, P, wt)
    wins = jnp.einsum("aix,xqj->aqij", x_mat.astype(jnp.bfloat16), s_mat,
                      preferred_element_type=jnp.float32)
    return wins.reshape(p, p, ht * wt).astype(out_dtype)


def timeit(fn, reps=6):
    out = fn(imgs)
    _ = float(jnp.sum(out[..., ::32].astype(jnp.float32)))
    ts = []
    for _i in range(reps):
        t0 = time.time()
        out = fn(imgs)
        _ = float(jnp.sum(out[..., ::32].astype(jnp.float32)))
        ts.append(time.time() - t0)
    return min(ts)


for name, f in [
    ("current u8  ", jax.jit(jax.vmap(lambda x: extract_tile_windows_flat(
        x, TILE, MARGIN, out_dtype=jnp.uint8)))),
    ("current bf16", jax.jit(jax.vmap(lambda x: extract_tile_windows_flat(
        x, TILE, MARGIN, out_dtype=jnp.bfloat16)))),
    ("4axis   u8  ", jax.jit(jax.vmap(lambda x: extract_4axis(
        x, TILE, MARGIN, out_dtype=jnp.uint8)))),
    ("4axis   bf16", jax.jit(jax.vmap(lambda x: extract_4axis(
        x, TILE, MARGIN, out_dtype=jnp.bfloat16)))),
]:
    dt = timeit(f)
    print(f"{name}: {dt*1e3:8.2f} ms for {S} keyframe L0 extractions "
          f"({dt/S*1e3:.2f} ms each)")

a = np.asarray(jax.vmap(lambda x: extract_tile_windows_flat(
    x, TILE, MARGIN, out_dtype=jnp.uint8))(imgs[:2]))
b = np.asarray(jax.vmap(lambda x: extract_4axis(
    x, TILE, MARGIN, out_dtype=jnp.uint8))(imgs[:2]))
print("exact match:", np.array_equal(a, b))
