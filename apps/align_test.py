#!/usr/bin/env python
"""Test suite + demo app mirroring the reference's align_test
(align_test.cpp:43-702): pyramid/gradient/warp image dumps, transform
property tests (deterministic + randomized, seeds 12345/6789/9999), warp
correctness via phase correlation, and a two-image end-to-end alignment.

Usage:
    python apps/align_test.py [--input PATH] [--template PATH] [--out DIR]

Without --input, a synthetic natural-spectrum test image is used (the
reference expected ../input.png / ../../template.png at fragile relative
paths — align_test.cpp:45,631).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PASS = "[PASS]"
FAIL = "[FAIL]"
EPSILON = 1e-5  # align_test.cpp:249


def check(name, ok, failures):
    print(f"{PASS if ok else FAIL} {name}")
    if not ok:
        failures.append(name)


def test_pyr_down(img, out_dir, failures):
    """Pyramid build + per-level warp-shift verification via phase
    correlation (align_test.cpp:43-247)."""
    import jax.numpy as jnp
    import cv2

    from video_stabilizer_tpu import transforms as T
    from video_stabilizer_tpu.ops import build_pyramid, grad_xy, image_warp
    from video_stabilizer_tpu.ops.phase_corr import phase_correlate
    from video_stabilizer_tpu.config import AlignerParams, pyramid_shapes

    params = AlignerParams()
    shapes = pyramid_shapes(img.shape[1], img.shape[0], params)
    pyr = build_pyramid(jnp.asarray(img), len(shapes))
    check(f"pyramid has {len(shapes)} levels", len(pyr) == len(shapes), failures)

    for i, lvl in enumerate(pyr):
        cv2.imwrite(os.path.join(out_dir, f"pyramid_{i}.png"), np.asarray(lvl))
    gx, gy = grad_xy(pyr[0])
    cv2.imwrite(os.path.join(out_dir, "grad_x.png"),
                np.clip(np.abs(np.asarray(gx)) * 2, 0, 255).astype(np.uint8))
    cv2.imwrite(os.path.join(out_dir, "grad_y.png"),
                np.clip(np.abs(np.asarray(gy)) * 2, 0, 255).astype(np.uint8))

    # Warp by a known shift, recover with phase correlation within 0.5 px
    # (align_test.cpp:358-400) — per pyramid level (163-209).
    for i, lvl in enumerate(pyr):
        if lvl.shape[0] < 32 or lvl.shape[1] < 32:
            continue
        shift = (3.0, -2.0)
        t = T.make(0.0, 0.0, *shift)
        warped = image_warp(lvl, T.inverse(t)).astype(jnp.float32)
        det, resp = phase_correlate(lvl.astype(jnp.float32), warped)
        # phase_correlate returns the align-back shift (= -content motion);
        # see ops/phase_corr.py sign-convention note.
        err = np.hypot(float(det[0]) + shift[0], float(det[1]) + shift[1])
        # 0.5px tolerance like the reference (align_test.cpp:358-400);
        # small levels get a little slack (border effects dominate there).
        tol = 0.5 if lvl.shape[1] >= 128 else 0.75
        check(f"level {i} phase-correlate shift recovery ({err:.3f}px)",
              err < tol, failures)


def test_transforms(failures):
    """Property tests (align_test.cpp:261-601). The full set runs under
    pytest (tests/test_transforms.py); this mirrors the reference app."""
    import jax.numpy as jnp
    from video_stabilizer_tpu import transforms as T

    r = np.random.default_rng(12345)
    ts = np.zeros((50, 4), np.float32)
    ts[:, 0] = r.uniform(-0.1, 0.1, 50)
    ts[:, 1] = r.uniform(-0.1, 0.1, 50)
    ts[:, 2:] = r.uniform(-2, 2, (50, 2))
    ts = jnp.asarray(ts)
    pts = jnp.asarray(r.uniform(-100, 100, (16, 2)), jnp.float32)

    ok = True
    for i in range(50):
        rt = T.warp_points(T.inverse(ts[i]), T.warp_points(ts[i], pts))
        ok &= bool(np.allclose(np.asarray(rt), np.asarray(pts), atol=1e-3))
    check("randomized inverse round-trip (seed 12345)", ok, failures)

    r = np.random.default_rng(6789)
    a = jnp.asarray(r.uniform(-0.05, 0.05, (20, 4)), jnp.float32)
    b = jnp.asarray(r.uniform(-0.05, 0.05, (20, 4)), jnp.float32)
    ok = True
    for i in range(20):
        seq = T.warp_points(b[i], T.warp_points(a[i], pts))
        direct = T.warp_points(T.compose(a[i], b[i]), pts)
        ok &= bool(np.allclose(np.asarray(seq), np.asarray(direct), atol=1e-3))
    check("compose == sequential application (seed 6789)", ok, failures)

    r = np.random.default_rng(9999)
    c = jnp.asarray(r.uniform(-0.05, 0.05, (50, 4)), jnp.float32)
    ident = T.compose(c, T.inverse(c))
    check("inverse(compose) ~= identity (seed 9999)",
          bool(np.allclose(np.asarray(ident), 0, atol=1e-3)), failures)


def align_image_pair(template, inp, out_dir, failures):
    """Two-call AlignNextFrame E2E (align_test.cpp:625-691)."""
    import jax.numpy as jnp
    import cv2

    from video_stabilizer_tpu import transforms as T
    from video_stabilizer_tpu.models import VideoAligner
    from video_stabilizer_tpu.ops import warp_by_similarity_transform

    aligner = VideoAligner()
    aligner.align_next_frame(jnp.asarray(template))
    t, ok = aligner.align_next_frame(jnp.asarray(inp))
    check(f"pair alignment converged (t={np.asarray(t).round(4)})",
          bool(ok), failures)
    if ok:
        aligned = warp_by_similarity_transform(
            jnp.asarray(np.repeat(inp[..., None], 3, -1)), t)
        cv2.imwrite(os.path.join(out_dir, "aligned.png"), np.asarray(aligned))
        print(f"  wrote {out_dir}/aligned.png")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="input image (grayscale or color)")
    ap.add_argument("--template", help="template image for pair alignment")
    ap.add_argument("--out", default="output", help="artifact directory")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                    help="cpu (default: this is a correctness demo with "
                         "many one-off shapes; TPU compile dominates) or tpu")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import cv2
    from video_stabilizer_tpu.utils.io import natural_texture
    from video_stabilizer_tpu import transforms as T
    from video_stabilizer_tpu.ops import warp_image_bgr
    import jax.numpy as jnp

    os.makedirs(args.out, exist_ok=True)
    failures = []

    if args.input:
        img = cv2.imread(args.input, cv2.IMREAD_GRAYSCALE)
    else:
        img = natural_texture(360, 480, seed=12345)

    if args.template:
        template = cv2.imread(args.template, cv2.IMREAD_GRAYSCALE)
        inp = img
    else:
        # Synthesize the pair: template = img, input = img moved by a known
        # similarity transform.
        t_true = jnp.asarray([0.002, -0.003, 2.5, -1.5], jnp.float32)
        t_ul = T.center_to_ul(t_true, img.shape[1], img.shape[0],
                              minus_one=True)
        inp = np.asarray(warp_image_bgr(jnp.asarray(img), T.inverse(t_ul),
                                        interp="lanczos2", border="edge"))
        template = img
        print(f"synthetic pair with true motion {np.asarray(t_true)}")

    test_pyr_down(img, args.out, failures)
    test_transforms(failures)
    align_image_pair(template, inp, args.out, failures)

    print(f"\n{len(failures)} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
