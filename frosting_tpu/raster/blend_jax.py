"""Pure-JAX binned blend: a faithful scan-based simulation of the Pallas
kernels' work-list execution. Runs on any backend (CPU tests, fallback) and
shares the exact chunk math with the TPU kernels (chunk_math.py), so
jax-vs-pallas parity is bit-tight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from frosting_tpu.raster import chunk_math
from frosting_tpu.raster.binning import Binned
from frosting_tpu.raster.config import RasterConfig


def _pixel_coords(px0, py0, cfg: RasterConfig):
    """(P, 1) pixel-center coordinate columns for a tile at (px0, py0)
    (P-major orientation, matching chunk_math)."""
    p = cfg.tile_pixels
    sub = jnp.arange(p, dtype=jnp.int32)
    px = (px0 + sub % cfg.tile_w).astype(jnp.float32)[:, None]
    py = (py0 + sub // cfg.tile_w).astype(jnp.float32)[:, None]
    return px, py


def _pixel_basis_t(px, py, px0, py0, cfg: RasterConfig):
    """(basis_t (6, P), cx, cy) for the backward moment matmul; cx/cy is
    the tile's mean pixel coordinate (see chunk_math.tile_basis_t)."""
    cx = px0.astype(jnp.float32) + 0.5 * (cfg.tile_w - 1)
    cy = py0.astype(jnp.float32) + 0.5 * (cfg.tile_h - 1)
    return chunk_math.tile_basis_t(px.T, py.T, cx, cy), cx, cy


def blend_forward_jax(
    padded_fields: jnp.ndarray,  # [padded_rows, 16]
    binned: Binned,
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Returns out [n_tiles + 1, 4, P]: rows 0..2 color, row 3 t_mask."""
    k = cfg.chunk
    p = cfg.tile_pixels

    # Inherit the device-varying type of the data (no-op numerically) so the
    # scan carry is consistent under shard_map's varying-manual-axes check.
    taint = jnp.where(jnp.bool_(False), padded_fields[0, 0], jnp.float32(0))
    out = jnp.zeros((cfg.n_tiles + 1, 4, p), jnp.float32) + taint

    def body(carry, xs):
        out, t_all, t_mask, color = carry
        block, meta, pxy = xs
        out_row = Binned.meta_out(meta)
        first = Binned.meta_first(meta)
        last = Binned.meta_last(meta)
        px0 = Binned.pxy_px0(pxy)
        py0 = Binned.pxy_py0(pxy)
        fields = jax.lax.dynamic_slice(
            padded_fields, (block * k, 0), (k, padded_fields.shape[1])
        )
        t_all = jnp.where(first == 1, jnp.ones_like(t_all), t_all)
        t_mask = jnp.where(first == 1, jnp.ones_like(t_mask), t_mask)
        color = jnp.where(first == 1, jnp.zeros_like(color), color)
        px, py = _pixel_coords(px0, py0, cfg)
        t_all, t_mask, color = chunk_math.forward_chunk(
            fields.T, t_all, t_mask, color, px, py
        )
        tile_out = jnp.concatenate([color.T, t_mask.T], axis=0)  # (4, P)
        # branchless conditional write (lax.cond breaks under shard_map's
        # varying-manual-axes tracking)
        cur = jax.lax.dynamic_slice(out, (out_row, 0, 0), (1, 4, p))
        new = jnp.where(last == 1, tile_out[None], cur)
        out = jax.lax.dynamic_update_slice(out, new, (out_row, 0, 0))
        return (out, t_all, t_mask, color), None

    init = (
        out,
        jnp.ones((p, 1), jnp.float32) + taint,
        jnp.ones((p, 1), jnp.float32) + taint,
        jnp.zeros((p, 3), jnp.float32) + taint,
    )
    xs = (binned.work_block, binned.work_meta, binned.work_pxy)
    (out, _, _, _), _ = jax.lax.scan(body, init, xs)
    return out


def blend_backward_jax(
    padded_fields: jnp.ndarray,  # [padded_rows, 16]
    binned: Binned,
    out_fwd: jnp.ndarray,  # [n_tiles + 1, 4, P] forward result
    g_out: jnp.ndarray,  # [n_tiles + 1, 4, P] cotangent
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Returns per-instance gradient rows [padded_rows, 16]."""
    k = cfg.chunk
    p = cfg.tile_pixels
    taint = jnp.where(jnp.bool_(False), padded_fields[0, 0], jnp.float32(0))
    taint = taint + jnp.where(jnp.bool_(False), g_out[0, 0, 0], jnp.float32(0))
    grads = jnp.zeros_like(padded_fields) + taint

    def body(carry, xs):
        grads, t_all, gc_pre = carry
        block, meta, pxy = xs
        out_row = Binned.meta_out(meta)
        first = Binned.meta_first(meta)
        px0 = Binned.pxy_px0(pxy)
        py0 = Binned.pxy_py0(pxy)
        fields = jax.lax.dynamic_slice(
            padded_fields, (block * k, 0), (k, padded_fields.shape[1])
        )
        t_all = jnp.where(first == 1, jnp.ones_like(t_all), t_all)
        gc_pre = jnp.where(first == 1, jnp.zeros_like(gc_pre), gc_pre)
        g_tile = jax.lax.dynamic_slice(g_out, (out_row, 0, 0), (1, 4, p))[0]
        f_tile = jax.lax.dynamic_slice(out_fwd, (out_row, 0, 0), (1, 4, p))[0]
        g_color = g_tile[:3].T  # (P, 3)
        g_tmask = g_tile[3:4].T
        c_total = f_tile[:3].T
        t_final_mask = f_tile[3:4].T
        gc_total = jnp.sum(g_color * c_total, axis=1, keepdims=True)
        px, py = _pixel_coords(px0, py0, cfg)
        basis_t, cx, cy = _pixel_basis_t(px, py, px0, py0, cfg)
        grad_rows, t_all, gc_pre = chunk_math.backward_chunk(
            fields.T, g_color, g_tmask, gc_total, t_final_mask,
            t_all, gc_pre, px, py, basis_t, cx, cy,
        )
        grads = jax.lax.dynamic_update_slice(
            grads, grad_rows.T, (block * k, 0)
        )
        return (grads, t_all, gc_pre), None

    init = (
        grads,
        jnp.ones((p, 1), jnp.float32) + taint,
        jnp.zeros((p, 1), jnp.float32) + taint,
    )
    xs = (binned.work_block, binned.work_meta, binned.work_pxy)
    (grads, _, _), _ = jax.lax.scan(body, init, xs)
    return grads
