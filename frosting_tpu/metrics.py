"""Evaluation metrics over held-out views (the metrics.py:72-551 analogue).

PSNR and SSIM are computed natively. LPIPS follows the reference's
architecture (VGG16 features + learned linear heads,
gaussian_splatting/lpipsPyTorch/modules/*) implemented in JAX, but the
pretrained weights cannot be downloaded in an air-gapped environment: point
FROSTING_TPU_LPIPS_WEIGHTS at an .npz export of the torchvision VGG16 +
LPIPS linear weights to enable it; otherwise evaluate() reports
lpips=None.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import Camera
from frosting_tpu.ops.ssim import psnr as psnr_fn
from frosting_tpu.ops.ssim import ssim as ssim_fn


class LPIPS:
    """VGG16-based LPIPS (lpipsPyTorch/modules/lpips.py structure). Weights
    are loaded from an npz with torchvision parameter names; `features.N.
    weight/bias` for conv layers and `lin{k}.model.1.weight` heads."""

    SLICES = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
    CHANNELS = [64, 128, 256, 512, 512]
    # normalization constants (lpipsPyTorch/modules/networks.py)
    MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
    STD = np.array([0.458, 0.448, 0.450], np.float32)

    def __init__(self, weights_path: str):
        z = np.load(weights_path)
        self.convs = []
        for i in range(31):
            wk, bk = f"features.{i}.weight", f"features.{i}.bias"
            if wk in z:
                self.convs.append((i, jnp.asarray(z[wk]), jnp.asarray(z[bk])))
        self.lins = [
            jnp.asarray(z[f"lin{k}.model.1.weight"]) for k in range(5)
        ]

    def _vgg_features(self, x):
        feats = []
        conv_map = {i: (w, b) for i, w, b in self.convs}
        h = x
        for i in range(30):
            if i in conv_map:
                w, b = conv_map[i]
                h = jax.lax.conv_general_dilated(
                    h, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                ) + b[None, :, None, None]
            elif i in (4, 9, 16, 23):  # maxpool positions
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID",
                )
            else:
                h = jax.nn.relu(h)
            if i + 1 in (4, 9, 16, 23, 30):
                feats.append(h)
        return feats

    def __call__(self, a, b):
        """a, b: [3, H, W] in [0, 1]."""

        def norm(x):
            x = x * 2.0 - 1.0
            return (
                (x - jnp.asarray(self.MEAN)[:, None, None])
                / jnp.asarray(self.STD)[:, None, None]
            )[None]

        fa = self._vgg_features(norm(a))
        fb = self._vgg_features(norm(b))
        total = 0.0
        for f1, f2, lin in zip(fa, fb, self.lins):
            n1 = f1 / jnp.maximum(
                jnp.linalg.norm(f1, axis=1, keepdims=True), 1e-10
            )
            n2 = f2 / jnp.maximum(
                jnp.linalg.norm(f2, axis=1, keepdims=True), 1e-10
            )
            d = (n1 - n2) ** 2
            w = lin.reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(d * w, axis=1))
        return total


def get_lpips() -> Optional[LPIPS]:
    path = os.environ.get("FROSTING_TPU_LPIPS_WEIGHTS")
    if path and os.path.exists(path):
        return LPIPS(path)
    return None


def evaluate_views(
    render_fn,  # camera -> [3, H, W]
    cameras: List[Camera],
    gt_images: np.ndarray,
    lpips: Optional[LPIPS] = None,
) -> Dict[str, Optional[float]]:
    """PSNR/SSIM(/LPIPS) means over views (metrics.py's evaluate loop)."""
    psnrs, ssims, lpipss = [], [], []
    for cam, gt in zip(cameras, gt_images):
        img = jnp.clip(render_fn(cam), 0.0, 1.0)
        gt = jnp.asarray(gt)
        psnrs.append(float(psnr_fn(img, gt)))
        ssims.append(float(ssim_fn(img, gt)))
        if lpips is not None:
            lpipss.append(float(lpips(img, gt)))
    return {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "lpips": float(np.mean(lpipss)) if lpipss else None,
        "n_views": len(psnrs),
    }


def write_metrics(path: str, results: Dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
