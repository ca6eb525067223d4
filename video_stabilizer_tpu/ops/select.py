"""Keypoint outlier-rejection selection.

Replaces the reference's host-side nth_element over u16 warp-diff values
(alignment.cpp:460-492) with shape-static device ops:

- ``histogram_mask`` (default): integer-binned cumulative histogram
  threshold. The reference compares u16-truncated diffs, so binning by
  floor() reproduces its ordering exactly; all ties in the threshold bin
  are kept (the reference breaks ties arbitrarily). Cost: one (N, bins)
  compare-reduce — ~50x faster than jnp.quantile's sort on TPU.
- ``topk_mask``: exact floor(N*fraction) count via jax.lax.top_k (parity
  mode; arbitrary tie-break like nth_element).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Warp diffs of u8 images are <= 255; one overflow bin catches the rest.
DEFAULT_BINS = 257


def histogram_mask(wd, fraction, bins: int = DEFAULT_BINS, n_valid=None):
    """0/1 mask of the smallest-``fraction`` values of ``wd``.

    Finds the smallest integer threshold t in [0, bins) with
    count(floor(wd) <= t) >= floor(N*fraction), computed as ONE fused
    (bins, N) compare-reduce producing the cumulative count for every
    threshold at once, then a min over qualifying levels. A sequential
    bisection would be ~30x less arithmetic but pays ~35us of to-scalar
    reduction latency per step on TPU; the dense form is faster end-to-end
    (this runs once per pyramid level per frame inside the align program).

    Args:
      wd: (...,) non-negative diff values (float). Batched over leading
        axes? No — the threshold is global over all elements of ``wd``.
      fraction: traced or static scalar in (0, 1].
      n_valid: optional element count the keep target is computed from
        (defaults to ``wd.size``). The padded-level merge passes the REAL
        keypoint count here while the padded lanes carry values >= bins-1,
        reproducing the unpadded selection exactly (padded lanes land in
        the overflow bin, above any reachable threshold).
    Returns:
      float mask, same shape: 1.0 for kept entries. At least the requested
      count is kept (ties at the threshold bin are all included).
    """
    n = wd.size if n_valid is None else n_valid
    v = jnp.clip(jnp.floor(wd), 0, bins - 1).astype(jnp.float32)
    k = jnp.floor(jnp.asarray(n * fraction, jnp.float32))

    # Cumulative counts for ALL thresholds in one fused compare-reduce with
    # the data on the lane axis: counts[b] = #(v <= b) is monotone, so the
    # threshold is the min level whose count reaches k. (Sequential
    # bisection costs ~35us of to-scalar reduction latency per step on TPU.)
    flat = v.reshape(-1)
    levels = jnp.arange(bins, dtype=jnp.float32)
    counts = jnp.sum(flat[None, :] <= levels[:, None], axis=1,
                     dtype=jnp.float32)                       # (bins,)
    thresh = jnp.min(jnp.where(counts >= k, levels, float(bins)))
    return (v <= thresh).astype(wd.dtype)


def topk_mask(wd, fraction):
    """Exact-count selection mask via top_k (reference nth_element parity).
    ``fraction`` must be static (defines k)."""
    n = wd.size
    k = max(int(n * float(fraction)), 1)
    flat = wd.reshape(-1)
    _, idx = jax.lax.top_k(-flat, k)
    mask = jnp.zeros((n,), wd.dtype).at[idx].set(1.0)
    return mask.reshape(wd.shape)
