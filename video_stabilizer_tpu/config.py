"""Configuration for the aligner and stabilizer.

Defaults replicate the reference exactly:
  - AlignerParams:    alignment.hpp:5-41
  - StabilizerParams: stabilizer.hpp:13-30

Fields are split into *static* (shape-/trace-affecting — changing them
triggers a recompile) and *dynamic* (traced scalars — sweepable with ``vmap``
without recompilation). Dynamic fields are marked in the comments.
"""

from __future__ import annotations

import dataclasses
import os
from typing import ClassVar, Tuple


@dataclasses.dataclass(frozen=True)
class AlignerParams:
    """Per-frame alignment parameters (reference: alignment.hpp:5-41)."""

    # Initialize TX/TY from phase correlation at pyramid level 2 (useful for
    # fast pans; default off). alignment.hpp:11-12. [static: adds an FFT stage]
    phase_correlate: bool = False
    phase_correlate_threshold: float = 0.5  # [dynamic]

    # GN convergence: stop when the max corner movement in one iteration is
    # below this (pixels). alignment.hpp:19. [dynamic]
    threshold: float = 0.02

    # Fraction of keypoints (per axis set) kept after warp-diff outlier
    # rejection. alignment.hpp:26. [dynamic in "mask" mode]
    smallest_fraction: float = 0.8

    # Max GN iterations per pyramid level. alignment.hpp:31. [static: bounds
    # the while_loop]
    max_iters: int = 64

    # Fixed-iteration GN mode (latency extension, not in the reference):
    # when set, every level runs EXACTLY this many GN iterations as a
    # static unroll — no while_loop, no data-dependent trip count, so the
    # sequential dispatch depth of the streaming (batch=1) path collapses.
    # Convergence failure semantics become "last step still moved corners
    # >= threshold". None (default) keeps the reference's converge-or-
    # max_iters while_loop. [static]
    fixed_iters: int | None = None

    # Merge the GN programs of this many of the COARSEST pyramid levels
    # into ONE while_loop over zero-padded union buffers (latency
    # extension, not in the reference). The coarse levels' iterations are
    # dominated by fixed per-op dispatch latency, not compute, so running
    # levels back-to-back inside a single loop (per-level warpdiff /
    # selection / Hessian recomputed at level entry under lax.cond) cuts
    # the sequential program depth. 0 disables; values < 2 are no-ops.
    # Composes ONLY with selection="mask", fixed_iters=None (that mode has
    # no while_loops to merge) and gn_kernel in ("auto", "xla") — an
    # explicitly forced gn_kernel="pallas" runs every level in the Pallas
    # kernel, which has no merged form. Invalid combinations raise at
    # construction instead of silently ignoring the merge (the merged path
    # is a latency win the caller asked for). Numerics match the unmerged
    # path to f32 reduction-order tolerance (test_merged_levels.py).
    # [static]
    merge_coarse: int = 0

    # Pyramid stops when the next level would be smaller than this.
    # alignment.hpp:36-37. [static]
    pyramid_min_width: int = 20
    pyramid_min_height: int = 20

    # Fail the frame if the converged per-level displacement exceeds this
    # (pixels). alignment.hpp:40. [dynamic]
    max_displacement: float = 10.0

    # ---- TPU-native extensions (not in the reference) ----

    # Keypoint selection mode:
    #   "mask": quantile-threshold masking — fully dense, no top_k/gather;
    #           ties at the threshold are all kept (deviation from the
    #           reference's exact nth_element count, documented in SURVEY §7).
    #   "topk": exact-count selection with jax.lax.top_k (reference parity).
    selection: str = "mask"

    # Compute dtype for gradients/jacobians/ICA reductions. The reference
    # accumulates in f64 (generators.cpp:546-595); f32 with XLA tree
    # reductions is validated against the f64 oracle in tests.
    dtype: str = "float32"

    # Gauss-Newton inner-loop backend:
    #   "auto":   XLA while_loop at every level (since round 4 — see
    #             gn_min_bytes below: with u8 window storage the XLA loop
    #             measured faster than the Pallas in-VMEM kernel at every
    #             level size, 1080p AND 4K). Setting gn_min_bytes (or
    #             VIDSTAB_GN_MIN_BYTES) re-enables the size-floor hybrid.
    #   "pallas": force the Pallas kernel (interpreter mode off-TPU — the
    #             equivalence tests use this);
    #   "xla":    force the XLA while_loop.
    # The Pallas kernel keeps the (P, P, N) windows VMEM-resident across
    # all GN iterations instead of re-reading HBM per iteration; u8 window
    # storage halved that re-read and flipped the trade (docs/ROADMAP.md).
    gn_kernel: str = "auto"

    # Margin (pixels) of the pre-extracted per-tile sampling windows
    # (ops/patches.py). Supports warp displacements up to margin-2 px per
    # level; 12 covers the reference's max_displacement=10 envelope. Applied
    # to the two coarsest levels (which absorb the bulk inter-frame motion);
    # finer levels — whose intra-level refinement is sub-pixel after the
    # coarse init — use window_margin_fine to cut window memory/compute.
    window_margin: int = 12
    window_margin_fine: int = 6

    # Window-size floor (as-if-bf16 bytes) above which gn_kernel="auto"
    # runs a level's GN loop in the Pallas in-VMEM kernel on real TPU
    # backends. Round-4 A/B (3 alternating same-hour pairs at 1080p:
    # 765/772/770 hybrid vs 793/795/807 XLA; 4K config-4: 139.4/139.7
    # hybrid vs 141.6 XLA — BASELINE.md) showed the XLA while_loop wins at
    # EVERY level size once windows are stored u8 (half the HBM re-read
    # that motivated the in-VMEM kernel), so the default floor is DISABLED:
    # "auto" now resolves to the XLA loop everywhere. Set
    # VIDSTAB_GN_MIN_BYTES (or this field) to re-enable the hybrid for
    # experiments, or gn_kernel="pallas" to force the kernel. None
    # (default) resolves ONCE at construction from the env var — the
    # resolved value is part of this static jit key, so later env changes
    # never silently diverge from cached compiles. [static]
    gn_min_bytes: int | None = None

    # Batch each pair step's TWO independent alignments — frame A against
    # the carried keyframe and frame B (the new keyframe) against frame A —
    # into ONE 2-lane vmapped align program (batched/chunked paths only;
    # the streaming aligner is inherently sequential). The two aligns share
    # no data, and every GN while_loop already runs lane-masked under the
    # stream vmap, so widening the batch 2x halves the number of
    # sequential per-level GN loop programs per pair — designed against
    # the "GN-solve fusion soup" leaf-time cluster (BASELINE.md 4K
    # profile: 33k tiny launch-bound fused ops, 24.5% of leaf time).
    # DEFAULT OFF: measured a 5-7% LOSS on the 1080p 8-stream headline
    # (seq 796.0/811.2 fps vs vmap 757.7/753.2, alternating same-hour
    # pairs, round 4) — with 8 streams the loops are compute-bound, and
    # the 2-lane max() trip count makes a fast lane pay the slow lane's
    # iterations; see BASELINE.md "pair_vmap A/B". Automatically falls
    # back to sequential aligns when any level's GN runs in the Pallas
    # in-VMEM kernel (lane+stream nested vmap of the kernel is
    # unvalidated on hardware) or when merge_coarse >= 2 (the merged
    # loop's level-walker carry is not lane-maskable). [static]
    pair_vmap: bool = False

    # Sentinel floor meaning "auto never picks Pallas" (any real window is
    # smaller than this).
    GN_AUTO_DISABLED: ClassVar[int] = 1 << 62

    def __post_init__(self):
        if self.selection not in ("mask", "topk"):
            raise ValueError(f"selection must be 'mask' or 'topk', got "
                             f"{self.selection!r}")
        if self.gn_kernel not in ("auto", "pallas", "xla"):
            raise ValueError(f"gn_kernel must be 'auto', 'pallas' or 'xla',"
                             f" got {self.gn_kernel!r}")
        if self.merge_coarse >= 2:
            # The merged coarse-level loop only exists for the
            # mask-selection while_loop path; refuse combinations that
            # would silently fall back to the unmerged program.
            if self.selection != "mask":
                raise ValueError(
                    "merge_coarse >= 2 requires selection='mask' (the "
                    "merged loop's in-loop selection is histogram "
                    f"masking); got selection={self.selection!r}")
            if self.fixed_iters is not None:
                raise ValueError(
                    "merge_coarse >= 2 is incompatible with fixed_iters "
                    "(the fixed-iteration mode has no while_loops to "
                    "merge)")
            if self.gn_kernel == "pallas":
                raise ValueError(
                    "merge_coarse >= 2 is incompatible with "
                    "gn_kernel='pallas' (the Pallas in-VMEM kernel has no "
                    "merged multi-level form); use 'auto' or 'xla'")
        if self.gn_min_bytes is None:
            raw = os.environ.get("VIDSTAB_GN_MIN_BYTES",
                                 str(self.GN_AUTO_DISABLED))
            try:
                resolved = int(raw)
            except ValueError:
                raise ValueError(
                    f"VIDSTAB_GN_MIN_BYTES must be an int, got {raw!r}")
            object.__setattr__(self, "gn_min_bytes", resolved)


@dataclasses.dataclass(frozen=True)
class StabilizerParams:
    """Stabilizer parameters (reference: stabilizer.hpp:13-30)."""

    aligner: AlignerParams = dataclasses.field(default_factory=AlignerParams)

    # Frames of delay before output; also the smoother's lag-behind window.
    lag: int = 10                 # [static]
    # The smoother's lag-ahead window ("memory"). NOTE: at the defaults the
    # stabilizer pairs measurement[t] with smoothed[t+5] — a constant 5-frame
    # offset quirk, replicated (see SURVEY §3.1; smoother.cpp:84 +
    # stabilizer.cpp:48-56).
    smoother_memory: int = 5      # [static]
    lambda_: float = 4.0          # TV-L1 smoothing strength [dynamic]

    # If false, jitter = raw measurement (stabilizer.cpp:59-64).
    enable_smoother: bool = True  # [static]

    # Crop the stabilized output by this many pixels on each side.
    crop_pixels: int = 32         # [static]

    # Displacement-based decay of the accumulated correction
    # (stabilizer.cpp:69-87): decay lerps min_decay -> max_decay as the
    # accumulated corner displacement goes min_disp -> max_disp.
    min_disp: float = 48.0        # [dynamic]
    max_disp: float = 64.0        # [dynamic]
    min_decay: float = 0.9        # [dynamic]
    max_decay: float = 0.7        # [dynamic]

    # ---- TPU-native extensions ----
    # Output warp interpolation: "bilinear" matches the reference's
    # cv::warpAffine INTER_LINEAR (imgproc.cpp:472); "lanczos2" uses the
    # polynomial Lanczos2 kernel (the north-star bgr_image_warp).
    output_interp: str = "bilinear"

    # Output warp kernel: "pallas" = tile-local-base Pallas TPU kernel
    # (ops/pallas_warp.py — ~25x less HBM traffic, wider rotation envelope);
    # "fir" = global-base XLA shifted-slice FIR (ops/fast_warp.py);
    # "auto" = pallas on real TPU backends, fir elsewhere (CPU tests run
    # the XLA kernel compiled, and the Pallas kernel under its own
    # interpreter-mode unit tests).
    output_warp: str = "auto"

    # Static per-pixel residual bound of the gather-free output warp
    # (ops/fast_warp.py): covers |A,B| * image_radius + 1 px of
    # rotation/zoom fringe after bulk-translation removal. None (default)
    # resolves per resolution via ``default_residual_bound`` — the same
    # angular envelope (|A,B| <= ~0.0027) needs more pixels at larger
    # radii, so a fixed count would silently clamp 4K rotations that are
    # fine at 1080p. Positions beyond the bound clamp gracefully (pinned
    # by tests/test_fast_warp_oracle.py). Raise for extreme rotational
    # corrections; each +1 adds two taps per axis (~7% warp cost).
    output_residual_bound: int | None = None


def default_residual_bound(width: int, height: int) -> int:
    """Per-resolution residual bound for the gather-free output warp.

    Sized so rotational/zoom corrections up to |A,B| ~= 0.0027 (measured
    headroom above typical stabilization corrections of <= 0.002) stay
    inside the exact-interpolation envelope at this resolution's image
    radius: 4 px at <=1080p, 7 px at 4K.
    """
    import math

    radius = math.hypot(width, height) * 0.5
    return max(4, math.ceil(0.0027 * radius + 1.0))


def resolve_residual_bound(params: StabilizerParams, width: int,
                           height: int) -> int:
    """The static residual bound to trace the output warp with."""
    if params.output_residual_bound is not None:
        return params.output_residual_bound
    return default_residual_bound(width, height)


def pyramid_shapes(width: int, height: int, params: AlignerParams) -> Tuple[Tuple[int, int], ...]:
    """Static (width, height) of each pyramid level.

    Replicates the level-count rule of alignment.cpp:164-169: halve (integer
    division) until the *next* level would fall below pyramid_min.
    """
    levels = []
    w, h = width, height
    while True:
        levels.append((w, h))
        w //= 2
        h //= 2
        if not (w >= params.pyramid_min_width and h >= params.pyramid_min_height):
            break
    return tuple(levels)


def tile_size_for(width: int, height: int, min_tiles: int = 1000, max_tile_size: int = 20) -> int:
    """Largest even tile size in [2, 20] keeping >= min_tiles tiles.

    Replicates imgproc.cpp:151-162 exactly (including using width for x and
    height for y). Static per (resolution, level), so each level's argmax
    specializes at trace time — the analog of the reference's 10 AOT
    grad_argmax variants.
    """
    tile_size = 2
    for i in range(4, max_tile_size + 1, 2):
        if (width // i) * (height // i) < min_tiles:
            break
        tile_size = i
    return tile_size
