"""Poisson surface reconstruction as an FFT solve (TPU-native).

Replaces Open3D's create_from_point_cloud_poisson (coarse_shell.py:437-466)
with a uniform-grid screened-Poisson-style reconstruction that maps onto
the TPU: trilinear normal splatting (scatter-add), a spectral Laplacian
inverse (three jnp.fft FFTs), and an iso level chosen as the mean indicator
value at the input samples — the same normalization Kazhdan's SPSR uses.
The adaptive octree of SPSR is traded for a dense grid (128-256^3 fits HBM
easily), which suits the bounded, extent-normalized scenes of the pipeline.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _trilinear_scatter(grid, pts01, values, n):
    """Scatter-add values [P, C] into grid [n, n, n, C] at normalized
    coords pts01 in [0,1]."""
    x = jnp.clip(pts01 * (n - 1), 0.0, n - 1 - 1e-4)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - i0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                grid = grid.at[
                    i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz
                ].add(values * w[:, None])
    return grid


def _trilinear_sample(grid, pts01, n):
    """Sample grid [n, n, n] at normalized coords [P, 3]."""
    x = jnp.clip(pts01 * (n - 1), 0.0, n - 1 - 1e-4)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - i0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                out = out + w * grid[
                    i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz
                ]
    return out


import functools


@functools.partial(jax.jit, static_argnames=("n",))
def _poisson_grid(points01, normals, n: int):
    # Memory shape: the naive form materializes an [n,n,n,3] vector field
    # (1.5 GB f32 at 512^3) before taking its divergence, and a grid-sized
    # jnp.roll for the central difference lowered to a concat temp whose
    # minor-dim padding cost 32x (16 GB at 512^3 — OOM'd a v5e chip). The
    # divergence is instead taken SPECTRALLY: each normal component is
    # splatted into its own [n,n,n] grid, rfftn'd, and accumulated with the
    # i*sin(k_c) factor — the exact Fourier symbol of the central
    # difference, consistent with the 2(cos k - 1) Laplacian eigenvalues
    # below. Peak memory is one real grid + two half-spectra (~1.6 GB at
    # 512^3), which makes the reference's depth-9/10 range
    # (coarse_shell.py:80) practical on one chip.
    k = jnp.fft.fftfreq(n) * 2.0 * jnp.pi
    kr = jnp.fft.rfftfreq(n) * 2.0 * jnp.pi
    nr = kr.shape[0]

    div_hat = jnp.zeros((n, n, nr), jnp.complex64)
    for c in range(3):
        comp = jnp.zeros((n, n, n), jnp.float32)
        comp = _trilinear_scatter(
            comp[..., None], points01, -normals[:, c : c + 1], n
        )[..., 0]
        kc = (kr if c == 2 else k).reshape(
            [-1 if a == c else 1 for a in range(3)]
        )
        div_hat = div_hat + (1j * jnp.sin(kc)) * jnp.fft.rfftn(comp)

    # eigenvalues of the central-difference Laplacian: 2(cos k - 1) per
    # axis, built by broadcasting 1-D factors (a meshgrid materializes
    # three [n, n, n/2+1] arrays — ~1 GB of dead weight at 512^3)
    lam = 2.0 * (
        jnp.cos(k)[:, None, None]
        + jnp.cos(k)[None, :, None]
        + jnp.cos(kr)[None, None, :]
        - 3.0
    )
    lam = jnp.where(lam == 0.0, 1.0, lam)
    chi_hat = div_hat / lam
    chi_hat = chi_hat.at[0, 0, 0].set(0.0)
    chi = jnp.fft.irfftn(chi_hat, s=(n, n, n)).astype(jnp.float32)

    iso = jnp.mean(_trilinear_sample(chi, points01, n))
    return chi, iso


# Grid sizes >= this run the solve on the HOST CPU backend: the XLA-TPU
# FFT lowering of a 512-length axis materializes a f32[512,512,128,4]
# temp whose minor-dim tile padding costs 32x (16 GB — past one v5e's
# HBM), while the host solve at 512^3 is ~1.5 GB and extraction is a
# host-orchestrated offline stage anyway (marching tets runs on host).
FFT_CPU_THRESHOLD = 512


def poisson_reconstruct(
    points: np.ndarray,  # [P, 3]
    normals: np.ndarray,  # [P, 3] outward unit normals
    resolution: int = 128,
    pad: float = 0.15,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (verts, faces) of the reconstructed surface (outward-oriented)."""
    from frosting_tpu.extract.marching import marching_tets

    lo = points.min(axis=0)
    hi = points.max(axis=0)
    span = (hi - lo).max()
    lo = lo - pad * span
    hi_p = lo + (span * (1 + 2 * pad))
    points01 = (points - lo) / (hi_p - lo)

    if resolution >= FFT_CPU_THRESHOLD:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            chi, iso = _poisson_grid(
                jax.device_put(np.asarray(points01, np.float32), cpu),
                jax.device_put(np.asarray(normals, np.float32), cpu),
                resolution,
            )
    else:
        chi, iso = _poisson_grid(
            jnp.asarray(points01, jnp.float32),
            jnp.asarray(normals, jnp.float32),
            resolution,
        )
    chi = np.asarray(chi)
    iso = float(iso)
    spacing = (hi_p - lo) / (resolution - 1)
    # chi is higher inside; marching_tets orients normals toward lower
    # values = outward. (Well-defined for level sets of chi - iso.)
    verts, faces = marching_tets(
        chi, iso, origin=tuple(lo), spacing=tuple(spacing)
    )
    return verts, faces
