"""Gaussian covariance math: 3D covariance from scale/rotation and the EWA
projection to a 2D screen-space covariance.

Pure-JAX, differentiable re-derivation of computeCov3D / computeCov2D
(cuda_rasterizer/forward.cu:74-152). Operates on batches via vmap-friendly
broadcasting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from frosting_tpu.ops import quat as quat_ops

# 0.3-pixel low-pass added to the 2D covariance diagonal so every Gaussian is
# at least ~1px wide (forward.cu:110-111).
COV2D_LOWPASS = 0.3
# Frustum clamp factor for the EWA Jacobian linearization point
# (forward.cu:82-87).
EWA_CLAMP = 1.3


def cov3d_from_scale_quat(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] activated scales + [..., 4] unit wxyz quats -> [..., 6]
    packed upper-triangular covariance (xx, xy, xz, yy, yz, zz).

    Sigma = R S S^T R^T with S = diag(scales) (forward.cu:118-152).
    """
    R = quat_ops.to_matrix(quats)  # [..., 3, 3]
    M = R * scales[..., None, :]  # R @ diag(s)
    sigma = jnp.einsum(
        "...ik,...jk->...ij", M, M, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_cov3d(cov6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] packed -> [..., 3, 3] symmetric."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def ewa_project(
    means3d: jnp.ndarray,  # [..., 3] world positions
    cov6: jnp.ndarray,  # [..., 6] packed world covariance
    world_view: jnp.ndarray,  # [4, 4] row-vector convention
    focal_x,
    focal_y,
    tan_fov_x,
    tan_fov_y,
) -> jnp.ndarray:
    """EWA splatting 2D covariance (computeCov2D, forward.cu:74-113).

    Returns [..., 3] packed (cov_xx, cov_xy, cov_yy) INCLUDING the 0.3px
    low-pass on the diagonal.
    """
    W = world_view[:3, :3]  # row-vector: p_view = p @ W + wv[3,:3]
    t = (
        jnp.dot(means3d, W, precision=jax.lax.Precision.HIGHEST)
        + world_view[3, :3]
    )
    tz = t[..., 2]
    # Clamp the linearization point to 1.3x the frustum.
    txtz = jnp.clip(t[..., 0] / tz, -EWA_CLAMP * tan_fov_x, EWA_CLAMP * tan_fov_x)
    tytz = jnp.clip(t[..., 1] / tz, -EWA_CLAMP * tan_fov_y, EWA_CLAMP * tan_fov_y)
    tx = txtz * tz
    ty = tytz * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J = d(pix)/d(view): rows are screen x,y; columns view x,y,z.
    zeros = jnp.zeros_like(tz)
    j_row0 = jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], axis=-1)
    j_row1 = jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], axis=-1)
    J = jnp.stack([j_row0, j_row1], axis=-2)  # [..., 2, 3]

    V = unpack_cov3d(cov6)  # [..., 3, 3]
    # view-space covariance: W^T is cam rotation (column-vector) so
    # Sigma_view = Wc V Wc^T with Wc = W^T (row-vector storage).
    Wc = W.T
    hi = jax.lax.Precision.HIGHEST
    sigma_view = jnp.einsum("ab,...bc,dc->...ad", Wc, V, Wc, precision=hi)
    cov2 = jnp.einsum("...ib,...bc,...jc->...ij", J, sigma_view, J, precision=hi)
    cov_xx = cov2[..., 0, 0] + COV2D_LOWPASS
    cov_yy = cov2[..., 1, 1] + COV2D_LOWPASS
    cov_xy = cov2[..., 0, 1]
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def conic_and_radius(cov2d: jnp.ndarray):
    """Invert 2D covariance and compute the 3-sigma pixel radius
    (forward.cu:222-236).

    Returns (conic [..., 3] = (a, b, c) of the inverse, radius [...] float,
    det [...]).
    """
    cxx, cxy, cyy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv = 1.0 / det_safe
    conic = jnp.stack([cyy * inv, -cxy * inv, cxx * inv], axis=-1)
    mid = 0.5 * (cxx + cyy)
    sq = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + sq
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))
    return conic, radius, det
