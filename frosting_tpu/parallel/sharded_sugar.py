"""Sharded coarse-SuGaR training step (stage 2): the (data x tile) design
of sharded_train.py plus the surface-regularization losses.

Shardings:
  * photometric + entropy: strip-sharded render with exact halo-exchange
    SSIM (identical to the GS step); entropy is a per-gaussian mean over
    the replicated cloud (computed once, not summed across devices).
  * density-mode SDF estimation + better-normal losses
    (coarse_density.py:634-730): the SAMPLE axis is sharded — each device
    draws an independent 1/(n_data*n_tile) slice of the sample budget with
    a device-folded key and evaluates the KNN density field on the
    replicated cloud; the psum mean over devices equals a single-device
    step with the same total sample budget (up to sampling randomness).
  * depth-anchored 'sdf' mode (coarse_sdf.py:577-650, the MipNeRF360
    paper config): each device renders its DEPTH STRIP by reusing the
    shifted projection with per-gaussian view depth as the color, then
    all_gathers the strips along the tile axis into the full depth map —
    a differentiable gather whose transpose scatters the sample-loss
    gradients back to the owning strip — and evaluates its sample shard
    against it.

Params stay REPLICATED here by design (no shard_params option, unlike
sharded_train/sharded_frosting): the KNN field losses gather arbitrary
neighbors of the full cloud every step, so sharded storage would be
re-gathered whole anyway, and the coarse stage's budget (<= 500k
gaussians, ~350 MB params+Adam) fits one chip trivially — the 2-5M
memory wall this framework shards for is the REFINE stage's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from frosting_tpu.models import sugar as sugar_lib
from frosting_tpu.ops.ssim import l1_loss, psnr, ssim_strips
from frosting_tpu.raster import RasterConfig
from frosting_tpu.raster.preprocess import preprocess, shift_projected
from frosting_tpu.raster.render import render_projected
from frosting_tpu.scene.gaussians import activate
from frosting_tpu.train.sugar_trainer import SugarTrainConfig
from frosting_tpu.parallel.sharded_train import strip_config


def make_sharded_sugar_step(
    tx,
    rcfg: RasterConfig,
    cfg: SugarTrainConfig,
    mesh: Mesh,
    phase: str,  # "photo" | "entropy" | "sdf" (density-mode losses)
):
    """Returns jitted step(params, opt_state, cam_batch, gt_batch, knn_idx,
    key) -> (params, opt_state, metrics)."""
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    s_cfg = strip_config(rcfg, n_tile)
    strip_h = s_cfg.height
    bg_value = 1.0 if cfg.white_background else 0.0
    n_dev = n_data * n_tile
    samples_per_dev = max(256, cfg.n_sdf_samples // n_dev)

    def device_loss(params, camera, gt_strip, knn_idx, key, active_deg):
        bg = jnp.full((3,), bg_value, jnp.float32)
        tile_idx = jax.lax.axis_index("tile")
        data_idx = jax.lax.axis_index("data")
        y0 = tile_idx * strip_h

        means, scales, quats, opac, sh = activate(params)
        n = means.shape[0]
        shard = n // n_tile
        sl = lambda x: jax.lax.dynamic_slice_in_dim(
            x, tile_idx * shard, shard
        )
        proj_local = preprocess(
            sl(means), sl(scales), sl(quats), sl(opac), sl(sh),
            camera, rcfg, active_sh_degree=active_deg,
        )
        proj = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "tile", tiled=True), proj_local
        )
        proj = shift_projected(proj, (0, y0), s_cfg, tile_aligned=True)
        out = render_projected(proj, s_cfg, bg=bg)

        ll1 = l1_loss(out.image, gt_strip)
        loss = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (
            1.0 - ssim_strips(out.image, gt_strip, "tile")
        )
        loss = loss / n_dev

        visible = proj.radii > 0
        live = visible & (params.mask > 0.5)
        if phase == "entropy":
            # per-gaussian mean over the REPLICATED cloud: divide by the
            # full device count so the psum equals one copy. Logit-space
            # entropy (NaN-free at f32 sigmoid saturation).
            loss = loss + cfg.entropy_factor * (
                sugar_lib.entropy_loss_from_logits(
                    params.opacities_raw, live
                )
            ) / n_dev
        if phase == "sdf":
            dev_key = jax.random.fold_in(
                key, data_idx * n_tile + tile_idx
            )
            inp = sugar_lib.sample_sdf_points(
                dev_key, means, scales, quats, knn_idx, live,
                samples_per_dev, cfg.sdf_sampling_scale_factor,
            )
            if cfg.method == "sdf":
                # depth-anchored mode: render this device's depth strip by
                # swapping the (already shifted) projection's colors for
                # the per-gaussian view depth — the same alpha-blended
                # depth the single-device render_depth_normal_maps
                # produces — then reassemble the full map across strips
                dproj = proj._replace(
                    colors=jnp.stack([proj.depths] * 3, axis=-1)
                )
                dout = render_projected(dproj, s_cfg, bg=jnp.zeros((3,)))
                acc = 1.0 - dout.t_final
                depth_strip = dout.image[0] / jnp.maximum(acc, 1e-6)
                depth_full = jax.lax.all_gather(
                    depth_strip, "tile", tiled=True
                )  # [H, W]
                sdf_l = sugar_lib.sdf_estimation_sdf_mode_loss(
                    inp, means, scales, quats, opac, depth_full,
                    camera, rcfg, cfg.spatial_extent,
                    beta_mode=cfg.beta_mode,
                )
            else:
                sdf_l = sugar_lib.sdf_estimation_density_loss(
                    inp, means, scales, quats, opac, beta_mode=cfg.beta_mode
                )
            bn_l = sugar_lib.better_normal_loss(
                inp, means, scales, quats, opac
            )
            loss = loss + (
                cfg.sdf_estimation_factor * sdf_l
                + cfg.sdf_better_normal_factor * bn_l
            ) / n_dev

        aux = (
            out.num_instances,
            out.overflow,
            psnr(jnp.clip(out.image, 0, 1), gt_strip),
        )
        return loss, aux

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data", None, "tile", None), P(), P()),
        out_specs=(P(), P(), P()),
    )
    def sharded_grads(params, cams, gts, knn_idx, key):
        camera = jax.tree.map(lambda x: x[0], cams)
        gt_strip = gts[0]
        (loss, aux), grads = jax.value_and_grad(
            lambda p: device_loss(
                p, camera, gt_strip, knn_idx, key, cfg.sh_degree
            ),
            has_aux=True,
        )(params)
        n_inst, ovf, psnr_strip = aux
        grads = jax.lax.psum(grads, ("data", "tile"))
        loss = jax.lax.psum(loss, ("data", "tile"))
        stats = jnp.stack(
            [jnp.float32(n_inst), jnp.float32(ovf), psnr_strip]
        )
        stats = jax.lax.pmax(stats, ("data", "tile"))
        return loss, grads, stats

    @jax.jit
    def step(params, opt_state, cam_batch, gt_batch, knn_idx, key):
        loss, grads, stats = sharded_grads(
            params, cam_batch, gt_batch, knn_idx, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "num_instances": stats[0],
            "overflow": stats[1],
            "psnr_strip": stats[2],
        }
        return params, opt_state, metrics

    return step
