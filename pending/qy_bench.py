"""HW experiment: Pallas warp row-remainder (qy) mechanisms.

The output-warp kernel is VPU-bound; 8 of its 17 y-taps exist only to
absorb the 8-row DMA alignment remainder qy (ops/pallas_warp.py). This
script, on a real TPU:
  1. checks Mosaic actually compiles the "roll" (dynamic sublane rotate)
     and "switch" (8-way static-slice branch) forms;
  2. pins bit-exactness of both against the shipped "taps" form on HW
     (interpreter-mode equality is already pinned in tests);
  3. A/Bs all three at the two deployment shapes: 4K lanczos2/homography
     (config 4) and 1080p bilinear/similarity (the headline bench).

Run: timeout 2400 python -u pending/qy_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from video_stabilizer_tpu.ops.pallas_warp import warp_frames_pallas

MODES = ("taps", "roll", "switch")


def bench_case(name, frames, ts, interp, model, reps=6):
    print(f"--- {name}: frames {frames.shape} {interp}/{model} ---",
          flush=True)
    outs = {}
    for mode in MODES:
        fn = jax.jit(lambda f, t, m=mode: warp_frames_pallas(
            f, t, interp=interp, model=model, qy_mode=m))
        try:
            out = fn(frames, ts)
            out.block_until_ready()
        except Exception as e:  # Mosaic refusal is a finding, not a crash
            print(f"{name} {mode}: COMPILE/RUN FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        outs[mode] = np.asarray(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            r = fn(frames, ts)
            np.asarray(r[0, 0, 0])  # force completion, tiny D2H
            best = min(best, time.time() - t0)
        n = frames.shape[0]
        print(f"{name} {mode}: best {best*1e3:.2f} ms "
              f"({best/n*1e3:.3f} ms/frame)", flush=True)
    base = outs.get("taps")
    for mode, got in outs.items():
        if base is None or mode == "taps":
            continue
        eq = np.array_equal(got, base)
        md = int(np.abs(got.astype(np.int64) - base.astype(np.int64)).max())
        print(f"{name} {mode}: bit-exact vs taps = {eq} (max diff {md})",
              flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # ty fractions cover several sublane remainders across the batch.
    def mk(n, h, w):
        frames = jnp.asarray(rng.integers(0, 256, (n, h, w, 3), np.uint8))
        ts = jnp.asarray(
            np.stack([[0.002 * rng.standard_normal(),
                       0.002 * rng.standard_normal(),
                       rng.uniform(-20, 20), rng.uniform(-20, 20)]
                      for _ in range(n)]), jnp.float32)
        return frames, ts

    f4, t4 = mk(8, 2160, 3840)
    p4 = jnp.concatenate([
        t4[:, :2] * 0.5,
        t4[:, 2:3] / 3840.0,
        t4[:, 1:2] * -0.5,
        t4[:, 0:1] * 0.5,
        t4[:, 3:4] / 3840.0,
        jnp.full((8, 1), 1e-3, jnp.float32),
        jnp.full((8, 1), -8e-4, jnp.float32)], axis=1)
    bench_case("4k", f4, p4, "lanczos2", "homography")

    f1, t1 = mk(16, 1080, 1920)
    bench_case("1080p", f1, t1, "bilinear", "similarity")
    bench_case("1080p-lanczos", f1, t1, "lanczos2", "similarity")

    # Tile-shape sweep (pure schedule knob, bit-identical): lane padding
    # of the x-extended width (tile_w + 10 -> next 128) vs DMA halo share
    # vs grid raggedness. 640/1920 divide both 1920 and 3840 exactly.
    for case, frames, ts, interp, model in (
            ("4k", f4, p4, "lanczos2", "homography"),
            ("1080p", f1, t1, "bilinear", "similarity")):
        for tile in ((216, 512), (216, 640), (216, 1024), (216, 1920),
                     (432, 1024)):
            if tile[0] > frames.shape[1] or tile[1] > frames.shape[2]:
                continue
            for mode in ("taps", "roll"):
                fn = jax.jit(lambda f, t, m=mode, tl=tile: warp_frames_pallas(
                    f, t, interp=interp, model=model, qy_mode=m, tile=tl))
                try:
                    fn(frames, ts).block_until_ready()
                except Exception as e:
                    print(f"tile {case} {tile} {mode}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                    continue
                best = float("inf")
                for _ in range(5):
                    t0 = time.time()
                    r = fn(frames, ts)
                    np.asarray(r[0, 0, 0])
                    best = min(best, time.time() - t0)
                n = frames.shape[0]
                print(f"tile {case} {tile} {mode}: best {best*1e3:.2f} ms "
                      f"({best/n*1e3:.3f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
