"""Photometric losses: L1, L2, windowed SSIM / D-SSIM.

Reference parity: frosting_utils/loss_utils.py:17-63 (11x11 Gaussian window,
sigma 1.5, per-channel depthwise convolution, C1=0.01^2, C2=0.03^2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a, b):
    return jnp.mean((a - b) ** 2)


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2)
    )
    g = g / g.sum()
    w2d = np.outer(g, g)
    return w2d.astype(np.float32)


def _depthwise_blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """img [C, H, W] -> same, per-channel 2D convolution, SAME padding."""
    c = img.shape[0]
    k = window.shape[0]
    kernel = jnp.asarray(window)[None, None].repeat(c, axis=0)  # [C,1,k,k]
    return jax.lax.conv_general_dilated(
        img[None],
        kernel,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )[0]


def _ssim_map(img1, img2, window_size, sigma):
    window = _gaussian_window(window_size, sigma)
    mu1 = _depthwise_blur(img1, window)
    mu2 = _depthwise_blur(img2, window)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window) - mu12
    c1, c2 = 0.01**2, 0.03**2
    return ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim(
    img1: jnp.ndarray,  # [C, H, W] in [0, 1]
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    return jnp.mean(_ssim_map(img1, img2, window_size, sigma))


def _exchange_row_halo(x: jnp.ndarray, axis_name: str, h: int) -> jnp.ndarray:
    """[C, H, W] strip -> [C, H+2h, W] with h rows of halo from the strip
    neighbors along `axis_name` (zeros at the image borders, matching the
    SAME zero-padding of the full-image convolution)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[:, :h]
    bot = x[:, -h:]
    # our bottom halo = the NEXT strip's top rows: every device sends its
    # top block up by one
    from_next = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    from_prev = jax.lax.ppermute(
        bot, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_prev = jnp.where(idx == 0, 0.0, from_prev)
    from_next = jnp.where(idx == n - 1, 0.0, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def ssim_strips(
    img1: jnp.ndarray,  # [C, strip_h, W] this device's horizontal strip
    img2: jnp.ndarray,
    axis_name: str,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """EXACT per-strip slice of the full-image SSIM, for strip-sharded
    rendering inside shard_map: halo rows are ppermuted from the neighbor
    strips so windows cross seams exactly as in the full-image computation;
    the mean over strips (e.g. via psum/n) equals the full-image ssim()."""
    h = window_size // 2
    p1 = _exchange_row_halo(img1, axis_name, h)
    p2 = _exchange_row_halo(img2, axis_name, h)
    m = _ssim_map(p1, p2, window_size, sigma)
    return jnp.mean(m[:, h:-h])


def dssim(img1, img2, **kw):
    return (1.0 - ssim(img1, img2, **kw)) / 2.0


def photometric_loss(pred, gt, dssim_factor: float = 0.2):
    """The reference training loss: (1-f)*L1 + f*D-SSIM
    (coarse_density.py:100-103 uses loss = (1-f)*L1 + f*(1-ssim)...)."""
    return (1.0 - dssim_factor) * l1_loss(pred, gt) + dssim_factor * (
        1.0 - ssim(pred, gt)
    )


def psnr(img1, img2):
    mse = jnp.mean((img1 - img2) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
