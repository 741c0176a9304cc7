"""Chunk-vectorized alpha compositing math, shared by the pure-JAX blend and
the Pallas TPU kernels.

The CUDA renderer composites front-to-back with a per-pixel sequential loop
and early termination (renderCUDA, forward.cu:261-374). On TPU we process K
Gaussians at a time against a whole pixel tile: the in-chunk transmittance
recurrence becomes a strictly-lower-triangular (K,K) matmul of log(1-alpha)
terms (MXU work), and per-pixel "done" semantics are reproduced exactly with
two carried transmittances:

  t_all  = prod over ALL seen alphas      — drives the stop test; monotone,
           so once T*(1-a) < eps fails it fails forever (== done flag).
  t_mask = prod over CONTRIBUTING alphas  — freezes at the stop, exactly the
           reference's final_T used for background compositing.

The backward re-walks chunks in the same forward order using the suffix trick
dL/da_k = u_k*T_k - gS_k/(1-a_k): the suffix color term gS is recovered from
the saved total (gS = g.C_total - g.C_prefix), replacing the reference's
back-to-front accum_rec recurrence (backward.cu:400-557) and its atomics with
per-instance gradient rows reduced by a segment-sum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from frosting_tpu.raster.config import (
    ALPHA_CLAMP,
    ALPHA_CUTOFF,
    TRANSMITTANCE_EPS,
)


def _shift_down(x: jnp.ndarray, s: int, fill: float) -> jnp.ndarray:
    """Shift rows down by s along axis 0, filling the top with `fill`."""
    return jnp.concatenate(
        [jnp.full((s,) + x.shape[1:], fill, x.dtype), x[:-s]], axis=0
    )


def cumprod_excl(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative product along axis 0 via a Hillis-Steele scan
    (log2(K) shifted multiplies). Linear-space, exactly the sequential
    product recurrence of renderCUDA — no log/exp round-trip."""
    k = x.shape[0]
    y = x
    s = 1
    while s < k:
        y = y * _shift_down(y, s, 1.0)
        s *= 2
    return _shift_down(y, 1, 1.0)


def tree_prod(x: jnp.ndarray) -> jnp.ndarray:
    """Product along axis 0 -> (1, P) via halving tree (Mosaic has no
    reduce_prod lowering)."""
    k = x.shape[0]
    while k > 1:
        half = k // 2
        x = x[:half] * x[half : 2 * half] if 2 * half == k else (
            jnp.concatenate([x[:half] * x[half : 2 * half], x[2 * half :]], 0)
        )
        k = x.shape[0]
    return x


def cumsum_incl(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along axis 0 (Hillis-Steele)."""
    k = x.shape[0]
    y = x
    s = 1
    while s < k:
        y = y + _shift_down(y, s, 0.0)
        s *= 2
    return y


class ChunkCommon(NamedTuple):
    alpha: jnp.ndarray  # (K, P)
    raw: jnp.ndarray  # (K, P) opacity * exp(power), pre-clamp
    one_minus: jnp.ndarray  # (K, P) 1 - alpha
    t_before: jnp.ndarray  # (K, P)
    m: jnp.ndarray  # (K, P) contribution mask (bool)
    w: jnp.ndarray  # (K, P) blend weights
    power: jnp.ndarray  # (K, P)
    dx: jnp.ndarray  # (K, P)
    dy: jnp.ndarray  # (K, P)


def _chunk_common(fields, t_all, px, py) -> ChunkCommon:
    """Shared forward recomputation. fields (K, 16) f32; t_all (1, P);
    px, py (1, P) pixel-center coordinates."""
    mx = fields[:, 0:1]
    my = fields[:, 1:2]
    ca = fields[:, 2:3]
    cb = fields[:, 3:4]
    cc = fields[:, 4:5]
    op = fields[:, 5:6]

    dx = mx - px  # (K, P)
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    raw = op * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_CLAMP, raw)
    alpha = jnp.where((power > 0.0) | (raw < ALPHA_CUTOFF), 0.0, alpha)
    one_minus = 1.0 - alpha
    # linear-space transmittance scan: exactly the sequential recurrence of
    # renderCUDA (forward.cu:343-351); log2(K) shifted multiplies, no
    # log/exp round-trip (transcendentals dominate the kernel otherwise)
    t_before = t_all * cumprod_excl(one_minus)
    m = t_before * one_minus >= TRANSMITTANCE_EPS
    w = jnp.where(m, alpha * t_before, 0.0)
    return ChunkCommon(alpha, raw, one_minus, t_before, m, w, power, dx, dy)


def forward_chunk(fields, t_all, t_mask, color, px, py):
    """One chunk of the forward blend.

    Args: fields (K,16); t_all, t_mask (1,P); color (3,P); px, py (1,P).
    Returns updated (t_all, t_mask, color).
    """
    c = _chunk_common(fields, t_all, px, py)
    cols = fields[:, 6:9]  # (K, 3)
    color = color + jax_dot_kp(cols, c.w)
    t_all = t_all * tree_prod(c.one_minus)
    t_mask = t_mask * tree_prod(jnp.where(c.m, c.one_minus, 1.0))
    return t_all, t_mask, color


def jax_dot_kp(cols, w):
    """(K, C) x (K, P) -> (C, P), contracting K on the MXU."""
    return jax.lax.dot_general(
        cols,
        w,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def backward_chunk(
    fields,  # (K, 16)
    g_color,  # (3, P) dL/dC for this tile
    g_tmask,  # (1, P) dL/dT_final
    gc_total,  # (1, P) sum_ch g_color * C_total (precomputed per tile)
    t_final_mask,  # (1, P) saved final masked transmittance
    t_all,  # (1, P) carried
    gc_pre,  # (1, P) carried sum_ch g_color * C_prefix
    px,
    py,
):
    """One chunk of the backward blend (forward-order re-walk).

    Returns (grad_rows (K,16), t_all', gc_pre').
    """
    c = _chunk_common(fields, t_all, px, py)
    cols = fields[:, 6:9]
    op = fields[:, 5:6]

    # u_k = sum_ch color_k,ch * g_ch  : (K, P)
    u = jnp.dot(
        cols,
        g_color,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    contrib = u * c.w  # (K, P)
    cum_incl = cumsum_incl(contrib)
    g_suffix = gc_total - (gc_pre + cum_incl)  # (K, P)

    one_minus = c.one_minus
    inv_om = 1.0 / one_minus
    dalpha = jnp.where(
        c.m,
        u * c.t_before - g_suffix * inv_om - g_tmask * t_final_mask * inv_om,
        0.0,
    )

    live = (c.power <= 0.0) & (c.raw >= ALPHA_CUTOFF)
    not_clamped = c.raw < ALPHA_CLAMP
    op_safe = jnp.where(op == 0.0, 1.0, op)
    g_exp = c.raw / op_safe  # = exp(power), no second transcendental
    dop_pix = jnp.where(live & not_clamped, dalpha * g_exp, 0.0)
    dpower = jnp.where(live & not_clamped, dalpha * c.alpha, 0.0)

    ca = fields[:, 2:3]
    cb = fields[:, 3:4]
    cc = fields[:, 4:5]
    ddx = dpower * (-(ca * c.dx + cb * c.dy))
    ddy = dpower * (-(cc * c.dy + cb * c.dx))

    dmx = jnp.sum(ddx, axis=1)
    dmy = jnp.sum(ddy, axis=1)
    dca = jnp.sum(dpower * (-0.5) * c.dx * c.dx, axis=1)
    dcb = jnp.sum(dpower * (-c.dx * c.dy), axis=1)
    dcc = jnp.sum(dpower * (-0.5) * c.dy * c.dy, axis=1)
    dop = jnp.sum(dop_pix, axis=1)
    # dL/dcolor_k = sum_p w_kp g_chp : (K,P)@(P,3)... via dot_general
    dcol = jax.lax.dot_general(
        c.w,
        g_color,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (K, 3)

    zeros = jnp.zeros_like(dmx)
    grad_rows = jnp.stack(
        [dmx, dmy, dca, dcb, dcc, dop, dcol[:, 0], dcol[:, 1], dcol[:, 2]]
        + [zeros] * 7,
        axis=-1,
    )

    t_all = t_all * tree_prod(c.one_minus)
    gc_pre = gc_pre + jnp.sum(contrib, axis=0, keepdims=True)
    return grad_rows, t_all, gc_pre
