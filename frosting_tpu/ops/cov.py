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


def matvec_rows(p: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """row-vector product p @ M for [..., k] x [k, m], unrolled to
    elementwise ops (avoids skinny-matmul lowering; exact f32)."""
    cols = [
        sum(p[..., i] * M[i, j] for i in range(p.shape[-1]))
        for j in range(M.shape[1])
    ]
    return jnp.stack(cols, axis=-1)


def cov3d_from_scale_quat(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] activated scales + [..., 4] unit wxyz quats -> [..., 6]
    packed upper-triangular covariance (xx, xy, xz, yy, yz, zz).

    Sigma = R S S^T R^T with S = diag(scales) (forward.cu:118-152).
    """
    R = quat_ops.to_matrix(quats)  # [..., 3, 3]
    M = R * scales[..., None, :]  # R @ diag(s)
    # sigma = M M^T, unrolled elementwise (see matvec_rows note)
    def mm(i, j):
        return (
            M[..., i, 0] * M[..., j, 0]
            + M[..., i, 1] * M[..., j, 1]
            + M[..., i, 2] * M[..., j, 2]
        )

    return jnp.stack(
        [mm(0, 0), mm(0, 1), mm(0, 2), mm(1, 1), mm(1, 2), mm(2, 2)],
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
    # NOTE on formulation: all small matrix products here are UNROLLED into
    # elementwise VPU ops instead of jnp.dot/einsum. Skinny [N,k]x[k,k]
    # matmuls trigger a pathological slow-gather mode in this TPU runtime
    # (see bench notes) and are no faster on the MXU anyway at k<=4.
    W = world_view[:3, :3]  # row-vector: p_view = p @ W + wv[3,:3]
    t = matvec_rows(means3d, W) + world_view[3, :3]
    tz = t[..., 2]
    # Clamp the linearization point to 1.3x the frustum.
    txtz = jnp.clip(t[..., 0] / tz, -EWA_CLAMP * tan_fov_x, EWA_CLAMP * tan_fov_x)
    tytz = jnp.clip(t[..., 1] / tz, -EWA_CLAMP * tan_fov_y, EWA_CLAMP * tan_fov_y)
    tx = txtz * tz
    ty = tytz * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows (d(pix)/d(view)): [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2

    # T = J @ Wc where Wc = cam rotation (column-vector) = W.T; rows of T:
    # T[0,:] = j00*Wc[0,:] + j02*Wc[2,:],  T[1,:] = j11*Wc[1,:] + j12*Wc[2,:]
    Wc = W.T
    t0 = j00[..., None] * Wc[0] + j02[..., None] * Wc[2]  # [..., 3]
    t1 = j11[..., None] * Wc[1] + j12[..., None] * Wc[2]

    # cov2 = T V T^T with V the packed symmetric cov3d — unrolled quadratic
    # forms (see matvec_rows note on avoiding skinny matmuls)
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))

    def quad(a, b):
        return (
            a[..., 0] * b[..., 0] * xx
            + a[..., 1] * b[..., 1] * yy
            + a[..., 2] * b[..., 2] * zz
            + (a[..., 0] * b[..., 1] + a[..., 1] * b[..., 0]) * xy
            + (a[..., 0] * b[..., 2] + a[..., 2] * b[..., 0]) * xz
            + (a[..., 1] * b[..., 2] + a[..., 2] * b[..., 1]) * yz
        )

    cov_xx = quad(t0, t0) + COV2D_LOWPASS
    cov_yy = quad(t1, t1) + COV2D_LOWPASS
    cov_xy = quad(t0, t1)
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


def axis_extents(cov2d: jnp.ndarray):
    """Per-axis 3-sigma extents of the 2D Gaussian: the ellipse
    {d^T cov2d^-1 d = 9} spans exactly +-3*sqrt(cov_xx) in x and
    +-3*sqrt(cov_yy) in y. Tighter than the isotropic 3*sigma_max bbox the
    CUDA reference uses (forward.cu:229-236) — for anisotropic splats
    (SuGaR flattens Gaussians onto surfaces) this cuts the duplicated
    (gaussian, tile) instance count substantially at identical tile-level
    truncation semantics."""
    rx = 3.0 * jnp.sqrt(jnp.maximum(cov2d[..., 0], 1e-12))
    ry = 3.0 * jnp.sqrt(jnp.maximum(cov2d[..., 2], 1e-12))
    return rx, ry
