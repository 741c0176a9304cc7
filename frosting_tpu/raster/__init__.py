"""Differentiable tile-binned Gaussian rasterizer, TPU-native.

Public API:
  render(gaussians-as-arrays, camera, config) -> (image, aux)

Architecture (a re-design of diff-gaussian-rasterization for XLA/Pallas, not
a port):
  1. preprocess  — pure, differentiable JAX: project means, EWA 2D covariance,
                   SH->RGB, radii and tile rects (preprocess.py).
  2. binning     — fixed-capacity instance expansion via searchsorted over
                   cumulative tile counts, one stable lexicographic
                   `lax.sort` on (tile, depth), then a K-aligned padded
                   per-tile layout plus a flat chunk work-list (binning.py).
                   Non-differentiable bookkeeping (integer indices only).
  3. blend       — a custom-VJP op over the packed instance fields. Forward
                   and backward are Pallas kernels on TPU (blend_pallas.py)
                   or a semantically identical pure-JAX scan elsewhere
                   (blend_jax.py). The backward writes per-instance gradient
                   rows (disjoint — no atomics) and reduces them with a
                   segment-sum.
"""

from frosting_tpu.raster.config import RasterConfig
from frosting_tpu.raster.render import render

__all__ = ["RasterConfig", "render"]
