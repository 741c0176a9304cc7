"""Gaussian density / SDF field evaluation (the SuGaR field machinery).

Pure-JAX re-derivation of SuGaR.get_field_values / get_beta
(frosting_scene/sugar_model.py:1203-1347): the density at x is the sum of
the K tracked neighbor Gaussians' un-normalized opacities
  d(x) = sum_j s_j exp(-1/2 || diag(1/sc_j) R_j^T (x - mu_j) ||^2),
the SDF is the beta-scaled log transform
  sdf(x) = beta(x) (sqrt(-2 log d(x)) - sqrt(-2 log level)).

Everything is a batched gather-and-reduce over [M, K] neighbor sets —
one fused XLA kernel per call; no Python loops.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from frosting_tpu.ops import quat as quat_ops


_BLOCKED_JIT_CACHE: dict = {}


class FieldValues(NamedTuple):
    density: jnp.ndarray  # [M] raw density (pre-normalization)
    density_norm: jnp.ndarray  # [M] clamp-normalized (<= ~1)
    neighbor_opacities: jnp.ndarray  # [M, K]
    beta: jnp.ndarray  # [M]
    sdf: jnp.ndarray  # [M]


def neighbor_opacities(
    x: jnp.ndarray,  # [M, 3]
    knn_idx: jnp.ndarray,  # [M, K]
    centers: jnp.ndarray,  # [N, 3]
    strengths: jnp.ndarray,  # [N]
    scales: jnp.ndarray,  # [N, 3] activated
    quats: jnp.ndarray,  # [N, 4] unit
    density_factor: float = 1.0,
) -> jnp.ndarray:
    """[M, K] per-neighbor un-normalized opacity contributions
    (sugar_model.py:1305-1309).

    Fully UNROLLED component math: the naive form builds [M, K, 3] /
    [M, K, 3, 3] intermediates whose trailing dims tile-pad up to 42x on
    TPU — a 4.2M x 16 eager evaluation (frosting init at the 200k-vertex
    reference mesh budget) tried to materialize a 34 GB gather output and
    OOM'd the chip. Component form keeps every array [M, K] (8x lane pad
    worst case) and fuses cleanly under jit."""
    g = lambda t: jnp.take(t, knn_idx, axis=0)  # [M, K] per component
    sh0 = x[:, 0:1] - g(centers[:, 0])
    sh1 = x[:, 1:2] - g(centers[:, 1])
    sh2 = x[:, 2:3] - g(centers[:, 2])
    w, qx, qy, qz = (g(quats[:, i]) for i in range(4))
    # columns of R (= rows of R^T), forward.cu:133-138 convention
    r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
    r01 = 2.0 * (qx * qy - w * qz)
    r02 = 2.0 * (qx * qz + w * qy)
    r10 = 2.0 * (qx * qy + w * qz)
    r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
    r12 = 2.0 * (qy * qz - w * qx)
    r20 = 2.0 * (qx * qz - w * qy)
    r21 = 2.0 * (qy * qz + w * qx)
    r22 = 1.0 - 2.0 * (qx * qx + qy * qy)
    inv0 = 1.0 / jnp.maximum(g(scales[:, 0]), 1e-12)
    inv1 = 1.0 / jnp.maximum(g(scales[:, 1]), 1e-12)
    inv2 = 1.0 / jnp.maximum(g(scales[:, 2]), 1e-12)
    # warped_a = (R^T shift)_a / s_a = (R[., a] . shift) / s_a
    w0 = (r00 * sh0 + r10 * sh1 + r20 * sh2) * inv0
    w1 = (r01 * sh0 + r11 * sh1 + r21 * sh2) * inv1
    w2 = (r02 * sh0 + r12 * sh1 + r22 * sh2) * inv2
    maha = jnp.clip(w0 * w0 + w1 * w1 + w2 * w2, 0.0, 1e8)
    return density_factor * g(strengths) * jnp.exp(-0.5 * maha)


def field_values(
    x: jnp.ndarray,
    knn_idx: jnp.ndarray,
    centers: jnp.ndarray,
    strengths: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    beta_mode: str = "weighted_average",
    log_beta: Optional[jnp.ndarray] = None,
    density_threshold: float = 1.0,
    density_factor: float = 1.0,
    opacity_min_clamp: float = 1e-16,
) -> FieldValues:
    nb = neighbor_opacities(
        x, knn_idx, centers, strengths, scales, quats, density_factor
    )
    density = jnp.sum(nb, axis=-1)
    # soft clamp at 1: d>=1 -> d / stop_grad(d) (sugar_model.py:1311-1312)
    density_norm = jnp.where(
        density >= 1.0,
        density / (jax.lax.stop_gradient(density) + 1e-12),
        density,
    )

    min_scaling = jnp.min(scales, axis=-1)[knn_idx]  # [M, K]
    if beta_mode == "learnable":
        if log_beta is None:
            raise ValueError("log_beta required for learnable beta")
        beta = jnp.exp(log_beta) * jnp.ones(x.shape[0], x.dtype)
    elif beta_mode == "average":
        beta = jnp.mean(min_scaling, axis=-1)
    elif beta_mode == "weighted_average":
        # (sugar_model.py get_beta, "Method 3": zero-opacity points get the
        # scene's largest min-scale so their sdf stays nonzero)
        op_sum = jnp.sum(nb, axis=-1, keepdims=True)
        weights = nb / jnp.maximum(op_sum, opacity_min_clamp)
        beta = jnp.sum(min_scaling * weights, axis=-1)
        # global (scene-wide) largest min-scale so the fallback is
        # independent of which neighbors — or which evaluation block —
        # a zero-opacity point happens to see
        fallback = jax.lax.stop_gradient(jnp.max(jnp.min(scales, axis=-1)))
        beta = jnp.where(op_sum[..., 0] == 0.0, fallback, beta)
    else:
        raise ValueError(f"unknown beta_mode {beta_mode}")

    clamped = jnp.maximum(density_norm, opacity_min_clamp)
    level_term = jnp.sqrt(-2.0 * jnp.log(jnp.minimum(density_threshold, 1.0)))
    sdf = beta * (jnp.sqrt(-2.0 * jnp.log(clamped)) - level_term)
    return FieldValues(
        density=density,
        density_norm=density_norm,
        neighbor_opacities=nb,
        beta=beta,
        sdf=sdf,
    )


def field_values_blocked(
    x: jnp.ndarray,
    knn_idx: jnp.ndarray,
    centers: jnp.ndarray,
    strengths: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    block: int = 1 << 19,
    **kw,
) -> FieldValues:
    """field_values over fixed-size JITTED blocks: eager evaluation at
    multi-million-point budgets materializes every [M, K] intermediate on
    device (~0.5 GB each at 4M x 16 after lane padding); blocking bounds
    the working set and jit fuses each block into a handful of buffers.
    One compile (static block size; the tail block is padded). The jitted
    executable is cached at module level keyed by the static kwargs, so
    repeated calls (e.g. the per-camera extraction loop) reuse it."""
    m = x.shape[0]
    if m <= block:
        return field_values(
            x, knn_idx, centers, strengths, scales, quats, **kw
        )
    log_beta = kw.pop("log_beta", None)
    cache_key = tuple(sorted(kw.items()))
    f = _BLOCKED_JIT_CACHE.get(cache_key)
    if f is None:
        static_kw = dict(kw)

        def run(xb, kb, centers, strengths, scales, quats, log_beta):
            return field_values(
                xb, kb, centers, strengths, scales, quats,
                log_beta=log_beta, **static_kw,
            )

        f = jax.jit(run)
        _BLOCKED_JIT_CACHE[cache_key] = f
    outs = []
    for i in range(0, m, block):
        xb = x[i : i + block]
        kb = knn_idx[i : i + block]
        pad = block - xb.shape[0]
        if pad:
            xb = jnp.concatenate([xb, jnp.zeros((pad, 3), xb.dtype)])
            kb = jnp.concatenate(
                [kb, jnp.zeros((pad, kb.shape[1]), kb.dtype)]
            )
        outs.append(f(xb, kb, centers, strengths, scales, quats, log_beta))
    full = jax.tree.map(lambda *t: jnp.concatenate(t), *outs)
    return jax.tree.map(lambda t: t[:m], full)


def sample_points_in_gaussians(
    key: jnp.ndarray,
    n_samples: int,
    centers: jnp.ndarray,  # [N, 3]
    scales: jnp.ndarray,  # [N, 3]
    quats: jnp.ndarray,  # [N, 4]
    weights: jnp.ndarray,  # [N] sampling probabilities (e.g. volumes)
    scale_factor: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
):
    """Sample points inside Gaussians, choosing Gaussians ~ weights
    (sugar_model.py:916-959 sample_points_in_gaussians). Returns
    (points [S, 3], gaussian_idx [S])."""
    if mask is not None:
        weights = weights * mask
    k1, k2 = jax.random.split(key)
    p = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    # inverse-CDF sampling: categorical(shape=(S,)) materializes an [S, N]
    # Gumbel matrix (~100 GB at 200k samples x 131k capacity); the
    # cumsum + binary search is O(S log N) and scale-safe
    cdf = jnp.cumsum(p)
    u = jax.random.uniform(k1, (n_samples,), maxval=cdf[-1])
    idx = jnp.clip(
        jnp.searchsorted(cdf, u, side="right"), 0, centers.shape[0] - 1
    )
    eps = jax.random.normal(k2, (n_samples, 3)) * scales[idx] * scale_factor
    offs = jnp.einsum("sij,sj->si", quat_ops.to_matrix(quats[idx]), eps)
    return centers[idx] + offs, idx
