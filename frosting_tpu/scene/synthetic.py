"""Procedural synthetic scenes for tests and benchmarks.

There is no dataset in this environment, so end-to-end training is validated
on generated scenes: a ground-truth Gaussian cloud rendered with our own
renderer produces the "photos"; training from a degraded/random init must
recover them (PSNR climbing). This matches BASELINE.json config 1 ("~5k
synthetic gaussians, single camera, CPU-runnable") and extends it with a
camera ring for full trainer runs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import Camera, look_at_camera
from frosting_tpu.raster import RasterConfig, render


def gaussian_blob_scene(
    n: int = 5000, seed: int = 0
) -> Tuple[jnp.ndarray, ...]:
    """A colorful blob cloud: returns activated (means, scales, quats,
    opacities, sh)."""
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 2 * np.pi, n)
    r = 0.6 + 0.25 * np.sin(3 * t) + rng.normal(scale=0.05, size=n)
    z = 0.4 * np.cos(2 * t) + rng.normal(scale=0.08, size=n)
    means = np.stack([r * np.cos(t), r * np.sin(t), z], axis=1)
    scales = np.exp(rng.uniform(np.log(0.01), np.log(0.05), (n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.4, 0.95, n)
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0] = (means + 1.2) * 0.8 + rng.normal(scale=0.05, size=(n, 3))
    sh[:, 1:4] = rng.normal(scale=0.08, size=(n, 3, 3))
    return tuple(
        jnp.asarray(a, jnp.float32) for a in (means, scales, quats, opac, sh)
    )


def camera_ring(
    n_cams: int = 24,
    radius: float = 3.0,
    height: float = 0.8,
    fov_deg: float = 50.0,
) -> List[Camera]:
    cams = []
    for i in range(n_cams):
        a = 2 * math.pi * i / n_cams
        eye = [radius * math.cos(a), radius * math.sin(a), height]
        cams.append(
            look_at_camera(
                eye=eye, target=[0.0, 0.0, 0.0], up=(0, 0, 1),
                fov_x=math.radians(fov_deg),
            )
        )
    return cams


def render_gt_images(
    gt_gaussians, cameras: List[Camera], cfg: RasterConfig, bg
) -> np.ndarray:
    """Render ground-truth views [n_cams, 3, H, W] with the jax backend."""
    # all arrays as explicit args — closed-over device constants trip the
    # TPU runtime's slow-gather mode (PERF_NOTES.md)
    fn = jax.jit(
        lambda g, cam, b: render(*g, cam, cfg, bg=b).image
    )
    return np.stack(
        [np.asarray(fn(gt_gaussians, c, jnp.asarray(bg))) for c in cameras]
    )


def degraded_init(
    gt_gaussians, keep: float = 0.3, jitter: float = 0.05, seed: int = 1
):
    """Subsample + jitter the GT cloud as a training starting point
    (stands in for a COLMAP seed cloud)."""
    means, scales, quats, opac, sh = (np.asarray(a) for a in gt_gaussians)
    rng = np.random.default_rng(seed)
    n = means.shape[0]
    idx = rng.choice(n, int(n * keep), replace=False)
    pts = means[idx] + rng.normal(scale=jitter, size=(len(idx), 3))
    from frosting_tpu.ops import sh as sh_ops

    cols = np.clip(np.asarray(sh_ops.sh_to_rgb(sh[idx, 0])), 0.0, 1.0)
    return pts.astype(np.float32), cols.astype(np.float32)
