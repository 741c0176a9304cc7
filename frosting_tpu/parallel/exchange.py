"""Primitive instance exchange over the tile axis — the expert-dispatch
analogue of SURVEY §7: instead of all-gathering EVERY device's projected
Gaussians (memory per chip does not scale with the primitive axis), each
device sends each projected Gaussian only to the strip(s) whose rows its
tile rect overlaps, via one `all_to_all` with fixed per-pair capacity.

Per-chip memory becomes O(n_tile * cap_pair) instead of O(N); cap_pair is
a static bound with an overflow flag, exactly like the rasterizer's
instance capacity. Gradients flow back through the same all_to_all (its
VJP is the reverse exchange) and the compaction gather's VJP scatter-adds
into the owning shard.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from frosting_tpu.raster import RasterConfig
from frosting_tpu.raster.preprocess import Projected

# exchange payload layout (float32 rows):
# 0:2 means2d | 2:5 conics | 5:8 colors | 8 opacity | 9 depth | 10 radius
# 11:15 full-image tile rect (carried exactly so the receiver keeps the
# sender's anisotropic-tight inclusion set; tile indices are small ints,
# exact in f32)
_W = 15


def _pack(proj: Projected) -> jnp.ndarray:
    return jnp.concatenate(
        [
            proj.means2d,
            proj.conics,
            proj.colors,
            proj.opacities[:, None],
            proj.depths[:, None],
            proj.radii.astype(jnp.float32)[:, None],
            proj.rect.astype(jnp.float32),
        ],
        axis=1,
    )


def _unpack(rows: jnp.ndarray, valid: jnp.ndarray) -> Projected:
    radii = jnp.where(valid, rows[:, 10], 0.0).astype(jnp.int32)
    rect = jnp.where(
        valid[:, None], rows[:, 11:15].astype(jnp.int32), 0
    )
    return Projected(
        means2d=rows[:, 0:2],
        conics=rows[:, 2:5],
        colors=rows[:, 5:8],
        opacities=jnp.where(valid, rows[:, 8], 0.0),
        depths=rows[:, 9],
        radii=radii,
        rect=rect,
        valid=valid,
    )


def exchange_projected(
    proj_local: Projected,
    axis_name: str,
    n_tile: int,
    strip_h: int,
    cap_pair: int,
    full_cfg: RasterConfig,
) -> Tuple[Projected, jnp.ndarray]:
    """Route each locally-projected Gaussian to the strips its tile rect
    overlaps. Returns (candidate Projected of size n_tile*cap_pair in the
    FULL-image pixel frame, overflow flag). Call shift_projected afterwards
    to move into the strip frame."""
    rows = _pack(proj_local)
    n_local = rows.shape[0]

    # full-image tile rect of the local shard (strip-independent) — use the
    # preprocess-computed rect directly (anisotropic-tight)
    valid = proj_local.valid
    ty0 = proj_local.rect[:, 1]
    ty1 = proj_local.rect[:, 3]
    tiles_per_strip = strip_h // full_cfg.tile_h

    def build_send(t):
        """Compact the gaussians overlapping strip t into [cap_pair] rows."""
        s0 = t * tiles_per_strip
        s1 = (t + 1) * tiles_per_strip
        want = valid & (ty1 > s0) & (ty0 < s1)
        pos = jnp.cumsum(want.astype(jnp.int32)) - 1
        count = jnp.sum(want.astype(jnp.int32))
        idx = jnp.zeros((cap_pair,), jnp.int32).at[
            jnp.where(want, pos, cap_pair)
        ].set(jnp.arange(n_local, dtype=jnp.int32), mode="drop")
        slot_valid = jnp.arange(cap_pair) < jnp.minimum(count, cap_pair)
        return rows[idx], slot_valid, count

    send_rows, send_valid, counts = jax.vmap(build_send)(
        jnp.arange(n_tile)
    )  # [n_tile, cap, W], [n_tile, cap], [n_tile]
    overflow = jnp.any(counts > cap_pair)

    # one all_to_all each for payload and validity: entry s of the result
    # is what source device s sent to US
    recv_rows = jax.lax.all_to_all(
        send_rows, axis_name, split_axis=0, concat_axis=0, tiled=True
    )
    recv_valid = jax.lax.all_to_all(
        send_valid, axis_name, split_axis=0, concat_axis=0, tiled=True
    )
    cand = _unpack(recv_rows.reshape(-1, _W), recv_valid.reshape(-1))
    overflow = jax.lax.pmax(overflow, axis_name)
    return cand, overflow
