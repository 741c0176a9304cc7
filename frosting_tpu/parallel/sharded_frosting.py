"""Sharded frosting REFINEMENT step — the hot loop that actually needs
chips (refine.py:464-571 runs 2M-5M Gaussians for up to 15k iterations).

Same mesh/axis design as parallel/sharded_train.py (data x tile):
  * "data"  — camera batch parallelism;
  * "tile"  — image strips for the blend, AND the primitive axis for the
    per-Gaussian stages: frosting activation (softmax-bary x cell corners)
    is per-Gaussian given the (small, replicated) shell, so each device
    activates + projects a 1/n_tile slice of the frosting (and of the
    background Gaussians) and all-gathers the projected set over ICI.
Parameter gradients are psum over both axes; the shell/corner arrays are
replicated (they are ~V+F sized, tiny next to N Gaussians).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from frosting_tpu.models.frosting import (
    FrostingMeta,
    FrostingParams,
    cell_corners,
)
from frosting_tpu.ops import quat as quat_ops
from frosting_tpu.ops.ssim import l1_loss, psnr, ssim_strips
from frosting_tpu.raster import RasterConfig
from frosting_tpu.raster.preprocess import preprocess, shift_projected
from frosting_tpu.raster.render import render_projected
from frosting_tpu.train.frosting_trainer import FrostingTrainConfig
from frosting_tpu.parallel.sharded_train import strip_config


# Leading-dim layout for primitive-sharded parameter storage: tile-major
# over the flattened mesh so an all_gather over "data" yields each tile
# row's CONTIGUOUS global slice [t*shard : (t+1)*shard] — the same rows
# the replicated path dynamic-slices, keeping instance order (and thus
# the binning sort's stable tie-break) identical to the single-chip step.
PRIM_SPEC = P(("tile", "data"))


def map_frosting_params(params: FrostingParams, big, rep) -> FrostingParams:
    """Build a FrostingParams-shaped tree applying `big` to the
    primitive-axis ([N]-leading) leaves and `rep` to the vertex-axis
    (replicated) leaves. Used for spec trees, sharding placement, and
    per-leaf gradient handling — one authoritative map of which leaf
    lives on which axis."""
    return FrostingParams(
        shell_verts=rep(params.shell_verts),
        inner_dist=rep(params.inner_dist),
        outer_dist=rep(params.outer_dist),
        bary_logits=big(params.bary_logits),
        scales_log=big(params.scales_log),
        quats_raw=big(params.quats_raw),
        opacities_raw=big(params.opacities_raw),
        sh_dc=big(params.sh_dc),
        sh_rest=big(params.sh_rest),
        bg=None if params.bg is None else jax.tree.map(big, params.bg),
    )


def frosting_param_specs(params: FrostingParams) -> FrostingParams:
    """PartitionSpec tree: primitive leaves sharded over every chip,
    vertex leaves replicated."""
    return map_frosting_params(
        params, lambda _: PRIM_SPEC, lambda _: P()
    )


def shard_frosting_params(mesh: Mesh, params: FrostingParams):
    """Place params (or a matching pytree, e.g. Adam state mirrors) so
    each chip owns capacity/n_chips gaussians' rows."""
    return map_frosting_params(
        params,
        lambda x: jax.device_put(x, NamedSharding(mesh, PRIM_SPEC)),
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
    )


def _activate_shard(
    params: FrostingParams, meta: FrostingMeta, sl_param, sl_meta
):
    """Activated arrays for one primitive shard. sl_param slices the
    parameter rows (identity when params are stored pre-sharded),
    sl_meta slices the replicated metadata."""
    corners = cell_corners(params, meta.faces)  # [F, 6, 3] replicated
    cell_idx = sl_meta(meta.cell_idx)
    w = jax.nn.softmax(sl_param(params.bary_logits), axis=-1)
    means = jnp.sum(w[..., None] * corners[cell_idx], axis=1)
    scales = jnp.exp(sl_param(params.scales_log))
    quats = quat_ops.normalize(sl_param(params.quats_raw))
    opac = jax.nn.sigmoid(sl_param(params.opacities_raw))
    sh = jnp.concatenate(
        [sl_param(params.sh_dc), sl_param(params.sh_rest)], axis=1
    )
    return means, scales, quats, opac, sh


def _activate_bg_shard(bg, sl):
    means = sl(bg.means3d)
    scales = jnp.exp(sl(bg.scales_log))
    quats = quat_ops.normalize(sl(bg.quats_raw))
    opac = jax.nn.sigmoid(sl(bg.opacities_raw)) * sl(bg.mask)
    sh = jnp.concatenate([sl(bg.sh_dc), sl(bg.sh_rest)], axis=1)
    return means, scales, quats, opac, sh


def make_sharded_frosting_step(
    tx,
    rcfg: RasterConfig,
    cfg: FrostingTrainConfig,
    mesh: Mesh,
    meta: FrostingMeta,
    primitive_exchange: bool = False,
    exchange_cap: int = 0,
    shard_params: bool = False,
):
    """Returns jitted step(params, opt_state, cam_batch, gt_batch)
    -> (params, opt_state, metrics). cam_batch leading dim n_data;
    gt_batch [n_data, 3, H, W] sharded (data, tile-strips). Shard with
    sharded_train.shard_batch.

    primitive_exchange: all_to_all-route projected Gaussians to owning
    strips (parallel/exchange.py) instead of all-gathering — per-chip
    TEMP memory then scales with the 2-5M-gaussian refine budget.

    shard_params: store parameters AND Adam moments sharded over the
    primitive axis across ALL chips (PRIM_SPEC, ZeRO-3 style): each chip
    owns capacity/n_chips gaussians' rows, all_gathers the "data" axis to
    form its tile row's contiguous shard inside the step, and receives
    its row gradients via the gathers' reduce_scatter VJPs — no psum of
    the big leaves, no replicated optimizer state. Place params with
    shard_frosting_params() (and init the optimizer on the placed
    params) before calling the step. Per-chip argument memory then falls
    ~1/n_chips — the wall for the 5M-gaussian BASELINE config 5."""
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    s_cfg = strip_config(rcfg, n_tile)
    strip_h = s_cfg.height
    bg_value = 1.0 if cfg.white_background else 0.0

    nc_pairs = None
    if cfg.regularize_shell:
        import numpy as _np

        from frosting_tpu.ops import mesh as _mesh_ops

        # static topology, computed once at build time; the term is
        # evaluated on replicated params (identical on every device) and
        # scaled so its psum contributes exactly once per step
        nc_pairs = jnp.asarray(
            _mesh_ops.adjacent_face_pairs(_np.asarray(meta.faces))
        )

    def device_loss(params: FrostingParams, camera, gt_strip, active_deg):
        bg_color = jnp.full((3,), bg_value, jnp.float32)
        tile_idx = jax.lax.axis_index("tile")
        y0 = tile_idx * strip_h

        if shard_params:
            # local block -> this tile row's contiguous global shard
            # (tile-major PRIM_SPEC layout; VJP = reduce_scatter, which
            # sums each row's gradient over every chip that rendered it)
            params = map_frosting_params(
                params,
                lambda x: jax.lax.all_gather(x, "data", tiled=True),
                lambda x: x,
            )
            shard = params.bary_logits.shape[0]
            sl = lambda x: x
        else:
            n = params.bary_logits.shape[0]
            if n % n_tile != 0:
                raise ValueError("n_gaussians must divide the tile axis")
            shard = n // n_tile

            def sl(x):
                return jax.lax.dynamic_slice_in_dim(
                    x, tile_idx * shard, shard
                )

        def sl_meta(x):
            return jax.lax.dynamic_slice_in_dim(x, tile_idx * shard, shard)

        parts = [_activate_shard(params, meta, sl, sl_meta)]
        if params.bg is not None:
            if shard_params:
                slb = lambda x: x
            else:
                nb = params.bg.capacity
                if nb % n_tile != 0:
                    raise ValueError("bg capacity must divide the tile axis")
                bshard = nb // n_tile

                def slb(x):
                    return jax.lax.dynamic_slice_in_dim(
                        x, tile_idx * bshard, bshard
                    )

            parts.append(_activate_bg_shard(params.bg, slb))
        arrays = [jnp.concatenate(xs) for xs in zip(*parts)]

        proj_local = preprocess(
            *arrays, camera, rcfg, active_sh_degree=active_deg
        )
        if primitive_exchange:
            from frosting_tpu.parallel.exchange import exchange_projected

            cap = exchange_cap or max(256, arrays[0].shape[0])
            proj, _xovf = exchange_projected(
                proj_local, "tile", n_tile, strip_h, cap, rcfg
            )
        else:
            proj = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "tile", tiled=True),
                proj_local,
            )
        proj = shift_projected(proj, (0, y0), s_cfg, tile_aligned=True)
        out = render_projected(proj, s_cfg, bg=bg_color)

        ll1 = l1_loss(out.image, gt_strip)
        loss = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (
            1.0 - ssim_strips(out.image, gt_strip, "tile")
        )
        loss = loss / (n_data * n_tile)
        if nc_pairs is not None:
            from frosting_tpu.train.frosting_trainer import (
                _shell_normal_consistency,
            )

            loss = loss + _shell_normal_consistency(
                params, meta, nc_pairs, cfg
            ) / (n_data * n_tile)
        aux = (
            out.num_instances,
            out.overflow,
            psnr(jnp.clip(out.image, 0, 1), gt_strip),
        )
        return loss, aux

    def _grads_impl(params, cams, gts):
        camera = jax.tree.map(lambda x: x[0], cams)
        gt_strip = gts[0]

        (loss, aux), grads = jax.value_and_grad(
            lambda p: device_loss(p, camera, gt_strip, cfg.sh_degree),
            has_aux=True,
        )(params)
        n_inst, ovf, psnr_strip = aux
        if shard_params:
            # primitive-leaf grads arrive ALREADY globally summed (and
            # sharded) via the data/tile gathers' reduce_scatter VJPs;
            # only the replicated vertex leaves need the all-reduce
            grads = map_frosting_params(
                grads,
                lambda g: g,
                lambda g: jax.lax.psum(g, ("data", "tile")),
            )
        else:
            grads = jax.lax.psum(grads, ("data", "tile"))
        loss = jax.lax.psum(loss, ("data", "tile"))
        stats = jnp.stack(
            [jnp.float32(n_inst), jnp.float32(ovf), psnr_strip]
        )
        stats = jax.lax.pmax(stats, ("data", "tile"))
        return loss, grads, stats

    def step(params: FrostingParams, opt_state, cam_batch, gt_batch):
        if shard_params:
            pspec = frosting_param_specs(params)
        else:
            pspec = P()
        sharded_grads = jax.shard_map(
            _grads_impl,
            mesh=mesh,
            in_specs=(pspec, P("data"), P("data", None, "tile", None)),
            out_specs=(P(), pspec, P()),
        )
        loss, grads, stats = sharded_grads(params, cam_batch, gt_batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if shard_params:
            # keep the updated params pinned to the primitive sharding so
            # XLA never re-replicates them between steps
            params = jax.lax.with_sharding_constraint(
                params,
                map_frosting_params(
                    params,
                    lambda _: NamedSharding(mesh, PRIM_SPEC),
                    lambda _: NamedSharding(mesh, P()),
                ),
            )
        metrics = {
            "loss": loss,
            "num_instances": stats[0],
            "overflow": stats[1],
            "psnr_strip": stats[2],
        }
        return params, opt_state, metrics

    return jax.jit(step)
