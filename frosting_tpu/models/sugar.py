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
    pushes opacities towards 0/1."""
    o = opacities
    ent = -o * jnp.log(o + 1e-10) - (1.0 - o) * jnp.log(1.0 - o + 1e-10)
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
    return jnp.mean(jnp.abs(fv.density_norm - target))


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
