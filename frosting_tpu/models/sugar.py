"""SuGaR surface-regularization machinery: normals, entropy/SDF/normal
losses, KNN tracking.

Functional re-design of the SuGaR model + coarse trainers
(frosting_scene/sugar_model.py, frosting_trainers/coarse_density.py):
the "model" is just GaussianParams plus these pure loss functions; KNN-16
tracking (reset every 500 iters, coarse_density.py:563-565) uses the
Morton-window KNN (ops/knn.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from frosting_tpu.models import fields
from frosting_tpu.ops import quat as quat_ops


def smallest_axis(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Per-Gaussian normal = rotation column of the smallest scale
    (sugar_model.get_smallest_axis via get_normals, sugar_model.py:977-999)."""
    R = quat_ops.to_matrix(quats)  # [N, 3, 3] columns are principal axes
    idx = jnp.argmin(scales, axis=-1)  # [N]
    return jnp.take_along_axis(R, idx[:, None, None].repeat(3, 1), axis=2)[
        ..., 0
    ]


def entropy_loss(opacities: jnp.ndarray, visible: jnp.ndarray) -> jnp.ndarray:
    """Binary entropy of visible opacities (coarse_density.py:542-555) —
    pushes opacities towards 0/1.

    The probabilities are clamped away from {0, 1}: with f32 sigmoid
    saturation (o == 1.0 exactly for logits above ~16.6) the fused XLA
    gradient of -(1-o)*log(1-o+eps) produced NaN for saturated rows —
    which then silently CULLED those gaussians (NaN opacity fails the
    >= ALPHA_CUTOFF preprocess test) and poisoned Adam state forever.
    At the clamp boundary the clip gradient is exactly zero, which is
    also the true limit of the entropy gradient there. Callers holding
    logits should prefer entropy_loss_from_logits (exact at any
    saturation)."""
    o = jnp.clip(opacities, 1e-7, 1.0 - 1e-7)
    ent = -o * jnp.log(o) - (1.0 - o) * jnp.log(1.0 - o)
    w = visible.astype(jnp.float32)
    return jnp.sum(ent * w) / jnp.maximum(jnp.sum(w), 1.0)


def entropy_loss_from_logits(
    logits: jnp.ndarray, visible: jnp.ndarray
) -> jnp.ndarray:
    """Binary entropy of sigmoid(logits), computed in logit space:
    log(o) = -softplus(-x) and log(1-o) = -softplus(x), so
    ent = o*softplus(-x) + (1-o)*softplus(x) — finite value AND gradient
    at any saturation (the probability-space form NaNs under XLA fusion
    once f32 sigmoid rounds to exactly 1)."""
    x = logits
    o = jax.nn.sigmoid(x)
    ent = o * jax.nn.softplus(-x) + (1.0 - o) * jax.nn.softplus(x)
    w = visible.astype(jnp.float32)
    return jnp.sum(ent * w) / jnp.maximum(jnp.sum(w), 1.0)


class SdfLossInputs(NamedTuple):
    samples: jnp.ndarray  # [S, 3]
    gaussian_idx: jnp.ndarray  # [S]
    knn_idx: jnp.ndarray  # [S, K] neighbor sets of the owning Gaussians


def sample_sdf_points(
    key,
    means: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    knn_idx_all: jnp.ndarray,  # [N, K]
    visible: jnp.ndarray,  # [N] bool sampling mask
    n_samples: int,
    sampling_scale_factor: float = 1.5,
) -> SdfLossInputs:
    """Sample points in visible Gaussians at 1.5x scale, uniform over
    Gaussians (sdf_sampling_proportional_to_volume=False,
    coarse_density.py:155-156, 634-639)."""
    weights = visible.astype(jnp.float32)
    samples, gidx = fields.sample_points_in_gaussians(
        key, n_samples, means, scales, quats, weights,
        scale_factor=sampling_scale_factor,
    )
    return SdfLossInputs(samples, gidx, knn_idx_all[gidx])


def sdf_estimation_density_loss(
    inp: SdfLossInputs,
    means: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    beta_mode: str = "average",
) -> jnp.ndarray:
    """Density-mode SDF estimation loss with projection estimation
    (coarse_density.py:653-656, 683-691): the density at a sample should be
    exp(-1/2 sdf^2 / beta^2) where sdf is the sample's offset projected on
    its Gaussian's normal."""
    fv = fields.field_values(
        inp.samples, inp.knn_idx, means, opacities, scales, quats,
        beta_mode=beta_mode, density_factor=1.0,
    )
    normals = smallest_axis(scales, quats)[inp.gaussian_idx]
    sdf_est = jnp.sum((inp.samples - means[inp.gaussian_idx]) * normals, -1)
    target = jnp.exp(-0.5 * sdf_est**2 / jnp.maximum(fv.beta, 1e-12) ** 2)
    # RAW density, not the clamp-normalized one: the reference compares
    # fields['density'] (cloned BEFORE the >=1 normalization,
    # sugar_model.py:1309-1312) against the target, so interior samples
    # with density > 1 feel the full flattening pressure
    return jnp.mean(jnp.abs(fv.density - target))


def render_depth_normal_maps(
    means, scales, quats, opac, camera, rcfg
):
    """Alpha-weighted depth and normal maps via the point-colors trick
    (sugar_model.py:2343-2387 render_image_with_depth_and_normal).
    Returns (depth [H,W], normal [3,H,W], acc [H,W])."""
    import jax.numpy as jnp

    from frosting_tpu.ops.cov import matvec_rows
    from frosting_tpu.raster import render

    homog = jnp.concatenate([means, jnp.ones_like(means[:, :1])], axis=-1)
    depth = matvec_rows(homog, camera.world_view[:, 2:3])[:, 0]
    normals = smallest_axis(scales, quats)
    # flip normals toward the camera (reference orients by view dir)
    to_cam = camera.cam_center - means
    sign = jnp.sign(jnp.sum(normals * to_cam, axis=-1, keepdims=True))
    normals = normals * jnp.where(sign == 0, 1.0, sign)

    out_d = render(
        means, scales, quats, opac, jnp.zeros_like(means[:, None]),
        camera, rcfg,
        colors_precomp=jnp.stack([depth, depth, depth], -1),
    )
    out_n = render(
        means, scales, quats, opac, jnp.zeros_like(means[:, None]),
        camera, rcfg, colors_precomp=normals,
    )
    acc = 1.0 - out_d.t_final
    depth_map = out_d.image[0] / jnp.maximum(acc, 1e-6)
    normal_map = out_n.image / jnp.maximum(acc, 1e-6)[None]
    return depth_map, normal_map, acc


def normal_from_depth(depth_map, camera, rcfg):
    """2DGS-style normals from depth finite differences
    (coarse_density_and_dn_consistency.py:17-57). Returns [3, H, W] world-
    space unit normals."""
    import jax.numpy as jnp

    h, w = depth_map.shape
    fx, fy = camera.focals(rcfg.projection_width, rcfg.projection_height)
    cx = (rcfg.projection_width - 1.0) / 2.0
    cy = (rcfg.projection_height - 1.0) / 2.0
    xs = (jnp.arange(w, dtype=jnp.float32)[None, :] - cx) / fx
    ys = (jnp.arange(h, dtype=jnp.float32)[:, None] - cy) / fy
    pts_cam = jnp.stack(
        [xs * depth_map, ys * depth_map, depth_map], axis=-1
    )  # [H, W, 3] view space
    dx = jnp.diff(pts_cam, axis=1, append=pts_cam[:, -1:])
    dy = jnp.diff(pts_cam, axis=0, append=pts_cam[-1:])
    n = jnp.cross(dx, dy)
    # NaN-safe normalize (linalg.norm's vjp is NaN at exactly 0)
    n = n * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-18)
    )
    # view->world rotation, unrolled: n_world = n_view @ R_view2world where
    # R_view2world rows are world_view[:3,:3]^T rows... with row-vector
    # storage, p_view = p_world @ Wv so p_world = p_view @ Wv^T (rotation).
    R = camera.world_view[:3, :3]  # world->view (row-vector)
    n_world = (
        n[..., 0:1] * R[:, 0][None, None]
        + n[..., 1:2] * R[:, 1][None, None]
        + n[..., 2:3] * R[:, 2][None, None]
    )
    # orient toward camera
    return -jnp.transpose(n_world, (2, 0, 1))


def dn_consistency_loss(depth_map, normal_map, acc, camera, rcfg):
    """1 - cos between rendered normals and depth-derived normals over
    covered pixels (dn_consistency.py:60-97, 644-657)."""
    import jax.numpy as jnp

    nd = normal_from_depth(depth_map, camera, rcfg)
    nm = normal_map * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(normal_map * normal_map, axis=0, keepdims=True), 1e-18)
    )
    cos = jnp.sum(nd * nm, axis=0)
    cos = jnp.abs(cos)  # sign-agnostic (normals can be flipped)
    w = (acc > 0.5).astype(jnp.float32)
    return jnp.sum((1.0 - cos) * w) / jnp.maximum(jnp.sum(w), 1.0)


def sample_depth_at_points(depth_map, pts_view, camera, rcfg):
    """Bilinear depth-map lookup at view-space points
    (get_points_depth_in_depth_map, sugar_model.py:1351-1374)."""
    import jax.numpy as jnp

    fx, fy = camera.focals(rcfg.projection_width, rcfg.projection_height)
    cx = (rcfg.projection_width - 1.0) / 2.0
    cy = (rcfg.projection_height - 1.0) / 2.0
    z = jnp.maximum(pts_view[:, 2], 1e-6)
    px = pts_view[:, 0] / z * fx + cx
    py = pts_view[:, 1] / z * fy + cy
    h, w = depth_map.shape
    px = jnp.clip(px, 0.0, w - 1.001)
    py = jnp.clip(py, 0.0, h - 1.001)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx_ = px - x0
    fy_ = py - y0
    d = (
        depth_map[y0, x0] * (1 - fx_) * (1 - fy_)
        + depth_map[y0, x0 + 1] * fx_ * (1 - fy_)
        + depth_map[y0 + 1, x0] * (1 - fx_) * fy_
        + depth_map[y0 + 1, x0 + 1] * fx_ * fy_
    )
    return d


def sdf_estimation_sdf_mode_loss(
    inp: SdfLossInputs,
    means, scales, quats, opacities,
    depth_map, camera, rcfg,
    spatial_extent: float,
    beta_mode: str = "average",
):
    """SDF-mode estimation loss (coarse_sdf.py:577-650): |sdf(x)| should
    match the depth-based distance estimate |depth(pix(x)) - z(x)|, scaled
    by extent/10 and clamped."""
    import jax.numpy as jnp

    from frosting_tpu.ops.cov import matvec_rows

    fv = fields.field_values(
        inp.samples, inp.knn_idx, means, opacities, scales, quats,
        beta_mode=beta_mode, density_factor=1.0 / inp.knn_idx.shape[1],
        density_threshold=1.0,
    )
    homog = jnp.concatenate(
        [inp.samples, jnp.ones_like(inp.samples[:, :1])], axis=-1
    )
    pts_view = matvec_rows(homog, camera.world_view[:, :3])
    proj_ok = pts_view[:, 2] > 0.2
    d_map = sample_depth_at_points(depth_map, pts_view, camera, rcfg)
    sdf_est = d_map - pts_view[:, 2]
    std = spatial_extent / 10.0
    err = jnp.abs(fv.sdf - jnp.abs(sdf_est)) / std
    err = jnp.clip(err, 0.0, 10.0 * spatial_extent)
    w = proj_ok.astype(jnp.float32)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)


def better_normal_loss(
    inp: SdfLossInputs,
    means: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
) -> jnp.ndarray:
    """Align each Gaussian's normal with the opacity/offset-weighted normals
    of its neighbors (coarse_density.py:702-730); gradients flow through the
    normals only (sdf_better_normal_gradient_through_normal_only=True)."""
    nb_op = jax.lax.stop_gradient(
        fields.neighbor_opacities(
            inp.samples, inp.knn_idx, means, opacities, scales, quats
        )
    )  # [S, K]
    normals = smallest_axis(scales, quats)
    closest_normals = normals[inp.knn_idx]  # [S, K, 3]
    sample_normals = normals[inp.gaussian_idx]  # [S, 3]
    sign = jnp.sign(
        jax.lax.stop_gradient(
            jnp.sum(closest_normals * sample_normals[:, None], -1, keepdims=True)
        )
    )
    closest_normals = closest_normals * sign

    closest_min_scaling = jax.lax.stop_gradient(
        jnp.min(scales, -1)[inp.knn_idx]
    )
    w = jnp.abs(
        jax.lax.stop_gradient(
            jnp.sum(
                (inp.samples[:, None] - means[inp.knn_idx]) * closest_normals,
                -1,
            )
        )
    )
    w = nb_op * w / jnp.maximum(closest_min_scaling, 1e-6) ** 2
    w_sum = jax.lax.stop_gradient(jnp.sum(w, -1))
    w = w / jnp.maximum(w_sum, 1e-6)[:, None]
    blended = jnp.sum(w[..., None] * closest_normals, axis=-2)
    return jnp.mean(jnp.sum((sample_normals - blended) ** 2, axis=-1))
