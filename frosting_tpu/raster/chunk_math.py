"""Chunk-vectorized alpha compositing math, shared by the pure-JAX blend and
the Pallas TPU kernels.

The CUDA renderer composites front-to-back with a per-pixel sequential loop
and early termination (renderCUDA, forward.cu:261-374). On TPU we process K
Gaussians at a time against a whole pixel tile.

ORIENTATION (deliberate, hardware-driven): arrays are (P, K) — pixels on
sublanes, gaussians on LANES. The instance buffer arrives as (16, K)
component rows, so per-gaussian scalars are direct (1, K) row slices that
broadcast against (P, 1) pixel columns with ZERO relayouts (the previous
(K, P) orientation required a (16,K)->(K,16) transpose per chunk), and the
backward's per-gaussian reductions land directly in the (16, K) gradient
block layout the out-DMA wants.

The in-chunk transmittance recurrence is a Hillis-Steele scan along lanes;
per-pixel "done" semantics are reproduced exactly with two carried
transmittances:

  t_all  (P,1) = prod over ALL seen alphas   — drives the stop test;
          monotone, so once T*(1-a) < eps fails it fails forever.
  t_mask (P,1) = prod over CONTRIBUTING alphas — freezes at the stop,
          exactly the reference's final_T used for background compositing.

The backward re-walks chunks in forward order using the suffix trick
dL/da_k = u_k*T_k - gS_k/(1-a_k): the suffix color term gS is recovered
from the saved total (gS = g.C_total - g.C_prefix), replacing the
reference's back-to-front accum_rec recurrence (backward.cu:400-557) and
its atomics with per-instance gradient rows reduced outside.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import NamedTuple

import jax
import jax.numpy as jnp

from frosting_tpu.raster.config import (
    ALPHA_CLAMP,
    ALPHA_CUTOFF,
    INSTANCE_WIDTH,
    TRANSMITTANCE_EPS,
)

# Inside Mosaic kernels, lane shifts lower ~13% faster as pltpu.roll +
# constant-mask select than as concatenate (measured at the (512, 128)
# chunk shape, scripts/perf_scan_variants.py). pltpu.roll only exists in
# kernel context, so the Pallas kernels opt in via kernel_mode(); the
# pure-JAX twin keeps the concatenate form (results agree within the
# blend parity tolerances — the shift itself is bitwise identical, only
# tree_prod's pairing order differs). A ContextVar (not a module global)
# so concurrent tracing threads can't leak kernel-mode lowerings into the
# pure-JAX twin or vice versa.
_KERNEL_MODE = contextvars.ContextVar("frosting_kernel_mode", default=False)


@contextlib.contextmanager
def kernel_mode():
    """Trace-time switch to Mosaic-native lane-shift lowerings."""
    token = _KERNEL_MODE.set(True)
    try:
        yield
    finally:
        _KERNEL_MODE.reset(token)


def _shift_right(x: jnp.ndarray, s: int, fill: float) -> jnp.ndarray:
    """Shift columns right by s along axis 1 (lanes), filling with `fill`."""
    if _KERNEL_MODE.get():
        from jax.experimental.pallas import tpu as pltpu

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
        return jnp.where(
            lane < s, jnp.asarray(fill, x.dtype), pltpu.roll(x, s, 1)
        )
    return jnp.concatenate(
        [jnp.full(x.shape[:1] + (s,), fill, x.dtype), x[:, :-s]], axis=1
    )


def cumprod_incl(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative product along axis 1 via a Hillis-Steele scan
    (log2(K) shifted multiplies). Linear-space, exactly the sequential
    product recurrence of renderCUDA — no log/exp round-trip."""
    k = x.shape[1]
    y = x
    s = 1
    while s < k:
        y = y * _shift_right(y, s, 1.0)
        s *= 2
    return y


def cumprod_excl(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative product along axis 1 (see cumprod_incl)."""
    return _shift_right(cumprod_incl(x), 1, 1.0)


def tree_prod(x: jnp.ndarray) -> jnp.ndarray:
    """Product along axis 1 -> (P, 1) via halving tree (Mosaic has no
    reduce_prod lowering)."""
    k = x.shape[1]
    if _KERNEL_MODE.get() and (k & (k - 1)) == 0:
        from jax.experimental.pallas import tpu as pltpu

        s = 1
        y = x
        while s < k:
            y = y * pltpu.roll(y, s, 1)
            s *= 2
        return y[:, :1]
    while k > 1:
        half = k // 2
        x = x[:, :half] * x[:, half : 2 * half] if 2 * half == k else (
            jnp.concatenate(
                [x[:, :half] * x[:, half : 2 * half], x[:, 2 * half :]], 1
            )
        )
        k = x.shape[1]
    return x


def cumsum_incl(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along axis 1 (Hillis-Steele)."""
    k = x.shape[1]
    y = x
    s = 1
    while s < k:
        y = y + _shift_right(y, s, 0.0)
        s *= 2
    return y


def tile_basis_t(px_row, py_row, cx, cy):
    """Pixel monomial basis (6, P): rows [1, x, y, x*x, y*y, x*y] of
    TILE-CENTERED coordinates x = px - cx, y = py - cy (px_row/py_row are
    (1, P)). Centering keeps the quadratic moment combinations
    cancellation-free (|x| <= tile_w/2). Built once per tile; the
    backward's per-gaussian spatial reductions become one MXU matmul
    against it (see backward_chunk).

    NOTE: evaluating the forward `power` as a (P, 6) @ (6, K) matmul was
    tried and MEASURED SLOWER on TPU v5e (bench 10.1 -> 9.5 Mpix/s): a
    (P, K) matmul output at HIGHEST precision costs ~a full matmul pass
    regardless of the 6-deep contraction, more than the 8 VPU ops it
    replaces. The moment matmul below keeps a (6, K) output, which is
    where the MXU trade actually wins."""
    x = px_row - cx
    y = py_row - cy
    one = jnp.ones_like(x)
    return jnp.concatenate([one, x, y, x * x, y * y, x * y], axis=0)


class ChunkCommon(NamedTuple):
    alpha: jnp.ndarray  # (P, K)
    raw: jnp.ndarray  # (P, K) opacity * exp(power), pre-clamp
    one_minus: jnp.ndarray  # (P, K) 1 - alpha
    t_before: jnp.ndarray  # (P, K)
    t_after_all: jnp.ndarray  # (P, 1) t_all after this whole chunk
    m: jnp.ndarray  # (P, K) contribution mask (bool)
    w: jnp.ndarray  # (P, K) blend weights
    power: jnp.ndarray  # (P, K)
    incl: jnp.ndarray  # (P, K) inclusive cumprod of one_minus


def _chunk_common(fields, t_all, px, py) -> ChunkCommon:
    """Shared forward recomputation. fields (W, K) f32 component rows;
    t_all (P, 1); px, py (P, 1) pixel-center coordinates."""
    mx = fields[0:1, :]  # (1, K)
    my = fields[1:2, :]
    ca = fields[2:3, :]
    cb = fields[3:4, :]
    cc = fields[4:5, :]
    op = fields[5:6, :]

    dx = mx - px  # (P, K)
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    raw = op * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_CLAMP, raw)
    alpha = jnp.where((power > 0.0) | (raw < ALPHA_CUTOFF), 0.0, alpha)
    one_minus = 1.0 - alpha
    # linear-space transmittance scan: exactly the sequential recurrence of
    # renderCUDA (forward.cu:343-351); log2(K) shifted multiplies, no
    # log/exp round-trip (transcendentals dominate the kernel otherwise).
    # The scan's last (inclusive) column doubles as the whole-chunk product
    # so the t_all update costs a lane slice, not a second reduction tree.
    incl = cumprod_incl(one_minus)
    t_before = t_all * _shift_right(incl, 1, 1.0)
    t_after_all = t_all * incl[:, -1:]
    m = t_before * one_minus >= TRANSMITTANCE_EPS
    w = jnp.where(m, alpha * t_before, 0.0)
    return ChunkCommon(
        alpha, raw, one_minus, t_before, t_after_all, m, w, power, incl
    )


def forward_chunk(fields, t_all, t_mask, color, px, py):
    """One chunk of the forward blend.

    Args: fields (W, K); t_all, t_mask (P, 1); color (P, 3); px, py (P, 1).
    Returns updated (t_all, t_mask, color).

    t_mask (the reference's final_T) is tracked as a running MIN of the
    masked test value v = t_all * incl rather than a product of masked
    one_minus factors: v is the transmittance AFTER each contributing
    gaussian and is non-increasing along the walk (v_{k+1} = v_k *
    one_minus_{k+1}), and the stop is a prefix property, so the min of
    contributing v's IS the last one — the final masked transmittance.
    A native lane min-reduction costs ~3 VPU ops where the halving
    tree_prod cost ~14 (Mosaic has no reduce_prod lowering).
    """
    c = _chunk_common(fields, t_all, px, py)
    cols = fields[6:9, :]  # (3, K)
    color = color + dot_pk(c.w, cols)
    v = t_all * c.incl  # (P, K)
    t_mask = jnp.minimum(
        t_mask, jnp.min(jnp.where(c.m, v, 1.0), axis=1, keepdims=True)
    )
    return c.t_after_all, t_mask, color


def dot_pk(w, cols):
    """(P, K) x (C, K) -> (P, C), contracting K on the MXU."""
    return jax.lax.dot_general(
        w,
        cols,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def backward_chunk(
    fields,  # (W, K)
    g_color,  # (P, 3) dL/dC for this tile
    g_tmask,  # (P, 1) dL/dT_final
    gc_total,  # (P, 1) sum_ch g_color * C_total (precomputed per tile)
    t_final_mask,  # (P, 1) saved final masked transmittance
    t_all,  # (P, 1) carried
    gc_pre,  # (P, 1) carried sum_ch g_color * C_prefix
    px,  # (P, 1)
    py,  # (P, 1)
    basis_t,  # (6, P) tile_basis_t (built once per tile, not per chunk)
    cx,
    cy,
):
    """One chunk of the backward blend (forward-order re-walk).

    Returns (grad_rows (W, K), t_all', gc_pre').
    """
    c = _chunk_common(fields, t_all, px, py)
    cols = fields[6:9, :]  # (3, K)
    op = fields[5:6, :]

    # u_pk = sum_ch g_color_pc * color_kc : (P, K). Elementwise broadcast
    # (5 VPU ops), NOT a matmul: a (P, K)-shaped MXU output at HIGHEST
    # costs ~a full matmul pass regardless of the 3-deep contraction —
    # the same measured trade as the forward `power` (see tile_basis_t).
    u = (
        g_color[:, 0:1] * cols[0:1, :]
        + g_color[:, 1:2] * cols[1:2, :]
        + g_color[:, 2:3] * cols[2:3, :]
    )
    contrib = u * c.w  # (P, K)
    cum_incl = cumsum_incl(contrib)
    g_suffix = gc_total - (gc_pre + cum_incl)  # (P, K)

    one_minus = c.one_minus
    inv_om = 1.0 / one_minus
    dalpha = jnp.where(
        c.m,
        u * c.t_before - g_suffix * inv_om - g_tmask * t_final_mask * inv_om,
        0.0,
    )

    live = (c.power <= 0.0) & (c.raw >= ALPHA_CUTOFF)
    not_clamped = c.raw < ALPHA_CLAMP
    dpower = jnp.where(live & not_clamped, dalpha * c.alpha, 0.0)

    # ALL per-gaussian spatial gradients are moments of dpower against the
    # pixel monomial basis: one (6, P) @ (P, K) MXU matmul replaces five
    # (P, K) elementwise product chains + six cross-sublane reductions.
    #   M = [sum dp, sum dp*x, sum dp*y, sum dp*x^2, sum dp*y^2, sum dp*x*y]
    mom = jax.lax.dot_general(
        basis_t,
        dpower,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (6, K)
    m0 = mom[0:1]
    m_x = mom[1:2]
    m_y = mom[2:3]
    m_xx = mom[3:4]
    m_yy = mom[4:5]
    m_xy = mom[5:6]

    mxc = fields[0:1, :] - cx  # (1, K) tile-centered means
    myc = fields[1:2, :] - cy
    ca = fields[2:3, :]
    cb = fields[3:4, :]
    cc = fields[4:5, :]
    # dx = mxc - x  =>  sum dp*dx = mxc*m0 - m_x, etc. (all (1, K) rows)
    s_x = mxc * m0 - m_x
    s_y = myc * m0 - m_y
    dmx = -(ca * s_x + cb * s_y)
    dmy = -(cc * s_y + cb * s_x)
    dca = -0.5 * (mxc * mxc * m0 - 2.0 * mxc * m_x + m_xx)
    dcc = -0.5 * (myc * myc * m0 - 2.0 * myc * m_y + m_yy)
    dcb = -(mxc * myc * m0 - mxc * m_y - myc * m_x + m_xy)
    # dop_pix = dalpha*exp(power) = dpower/op wherever dpower is nonzero
    # (there alpha == raw == op*exp(power)), so dop = m0/op — no extra
    # per-pixel pass and no second reduction.
    op_safe = jnp.where(op == 0.0, 1.0, op)
    dop = m0 / op_safe
    # dL/dcolor_ck = sum_p g_color_pc w_pk : (3, K)
    dcol = jax.lax.dot_general(
        g_color,
        c.w,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    grad_rows = jnp.concatenate(
        [dmx, dmy, dca, dcb, dcc, dop, dcol], axis=0
    )  # (INSTANCE_WIDTH, K)

    gc_pre = gc_pre + cum_incl[:, -1:]
    return grad_rows, c.t_after_all, gc_pre
