"""Multi-chip sharded training step: data (cameras) x tile (image strips)
parallelism with primitive-sharded preprocess.

The reference is strictly single-GPU (SURVEY.md §2 parallelism checklist);
this is the greenfield TPU scale-out design:

  mesh axes ("data", "tile")
  * data  — camera/batch parallelism: each data-slice trains on a different
    camera; gradients all-reduced (the dp analogue).
  * tile  — intra-image parallelism: each device renders a horizontal strip
    of the image (the sequence/context-parallel analogue; strips are
    independent given their instance lists, so the exchange is halo-free).
  * primitive sharding (the tp analogue): inside a tile group, per-Gaussian
    preprocess (projection/EWA/SH) runs on a 1/n_tile slice of the cloud and
    the projected set is all-gathered over ICI; the blend's backward
    psum-scatters cotangents back to the owning shard automatically via the
    all_gather VJP.

Gradients for the replicated parameters are `psum` over both axes, fused by
XLA with the backward pass. Densification runs on replicated state outside
the sharded region (cheap, interval-based).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from frosting_tpu.cameras import Camera
from frosting_tpu.ops.ssim import l1_loss, psnr, ssim_strips
from frosting_tpu.raster import RasterConfig
from frosting_tpu.raster.preprocess import preprocess, shift_projected
from frosting_tpu.raster.render import render_projected
from frosting_tpu.scene.gaussians import GaussianParams, activate
from frosting_tpu.train import densify as densify_lib
from frosting_tpu.train.gs_trainer import GSTrainConfig, TrainState


# Leading-dim layout for primitive-sharded parameter storage (ZeRO-3
# style): tile-major over the flattened mesh, so an all_gather over
# "data" yields each tile row's CONTIGUOUS global slice — identical rows
# to the replicated path's dynamic_slice (see sharded_frosting.PRIM_SPEC).
PRIM_SPEC = P(("tile", "data"))


def _capacity_spec_tree(tree, capacity):
    """Spec tree: capacity-leading leaves sharded over every chip,
    everything else (scalars, schedule counts) replicated."""
    return jax.tree.map(
        lambda x: PRIM_SPEC
        if (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == capacity)
        else P(),
        tree,
    )


def shard_train_state(mesh: Mesh, state) -> "TrainState":
    """Place a TrainState (params + Adam moments + densify stats +
    max_radii) so each chip owns capacity/n_chips gaussians' rows."""
    cap = state.params.capacity
    return jax.tree.map(
        lambda x: jax.device_put(
            x,
            NamedSharding(
                mesh,
                PRIM_SPEC
                if (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap)
                else P(),
            ),
        ),
        state,
    )


def make_mesh(n_data: int, n_tile: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_data * n_tile:
        raise ValueError(
            f"need {n_data * n_tile} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(dev, ("data", "tile"))


def strip_config(rcfg: RasterConfig, n_tile: int) -> RasterConfig:
    """Per-device raster config: a horizontal strip of the full image."""
    if rcfg.height % n_tile != 0:
        raise ValueError("image height must divide the tile axis")
    strip_h = rcfg.height // n_tile
    if strip_h % rcfg.tile_h != 0:
        raise ValueError("strip height must divide the pixel-tile height")
    max_inst = max(rcfg.chunk, (rcfg.max_instances // n_tile) // rcfg.chunk * rcfg.chunk)
    return dataclasses.replace(
        rcfg,
        height=strip_h,
        proj_width=rcfg.projection_width,
        proj_height=rcfg.projection_height,
        max_instances=max_inst,
    )


def make_sharded_train_step(
    tx,
    rcfg: RasterConfig,
    cfg: GSTrainConfig,
    mesh: Mesh,
    primitive_exchange: bool = False,
    exchange_cap: int = 0,
    shard_params: bool = False,
):
    """Returns jitted step(state, cam_batch, gt_batch) -> (state, metrics).

    cam_batch: Camera pytree with leading dim n_data (sharded over "data").
    gt_batch:  [n_data, 3, H, W] (sharded over ("data", None, "tile", None)).

    primitive_exchange: route projected Gaussians to owning strips via
    all_to_all (parallel/exchange.py) instead of all-gathering the full
    projected set — per-chip memory then scales with the primitive axis.
    exchange_cap: per-source-device routing capacity (0 = capacity/n_tile).

    shard_params: store params, Adam moments, densify stats and max_radii
    sharded over ALL chips (PRIM_SPEC; place the state with
    shard_train_state first). Each chip all_gathers the "data" axis to
    form its tile row's contiguous shard inside the step; row gradients
    arrive via the gathers' reduce_scatter VJPs. Pair with
    make_sharded_densify_step for interval densification on the SAME
    sharded state (per-shard allocator, no re-replication).
    """
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    s_cfg = strip_config(rcfg, n_tile)
    strip_h = s_cfg.height
    bg_value = 1.0 if cfg.white_background else 0.0

    def device_loss(params, camera, gt_strip, probe, active_deg):
        """Runs per device inside shard_map."""
        # bg constructed inside the trace (no device-constant closure)
        bg = jnp.full((3,), bg_value, jnp.float32)
        tile_idx = jax.lax.axis_index("tile")
        y0 = tile_idx * strip_h

        if shard_params:
            # local (tile,data) block -> this tile row's contiguous shard
            params, probe = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "data", tiled=True),
                (params, probe),
            )
            means, scales, quats, opac, sh = activate(params)
            shard = means.shape[0]
            sl = lambda x: x
        else:
            means, scales, quats, opac, sh = activate(params)
            n = means.shape[0]
            shard = n // n_tile
            sl = lambda x: jax.lax.dynamic_slice_in_dim(
                x, tile_idx * shard, shard
            )

        # --- primitive-sharded preprocess (tp analogue) ---
        # Each device projects its Gaussian shard in the FULL-image pixel
        # frame (strip-independent), then either all-gathers the projected
        # set or all_to_all-routes it to owning strips.
        probe_l = sl(probe)
        proj_local = preprocess(
            sl(means), sl(scales), sl(quats), sl(opac), sl(sh),
            camera, rcfg, active_sh_degree=active_deg,
        )
        proj_local = proj_local._replace(
            means2d=proj_local.means2d + probe_l
        )
        if primitive_exchange:
            from frosting_tpu.parallel.exchange import exchange_projected

            cap = exchange_cap or max(256, shard)
            proj, _xovf = exchange_projected(
                proj_local, "tile", n_tile, strip_h, cap, rcfg
            )
            # densification stats need per-GAUSSIAN radii in original
            # order; the candidate set is strip-routed, so gather just the
            # radii (tiny [N] int32) — or, under shard_params, keep just
            # this row's radii (the stats arrays are sharded too)
            radii_stats = (
                proj_local.radii
                if shard_params
                else jax.lax.all_gather(proj_local.radii, "tile", tiled=True)
            )
        else:
            proj = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "tile", tiled=True),
                proj_local,
            )
            radii_stats = proj_local.radii if shard_params else proj.radii
        proj = shift_projected(proj, (0, y0), s_cfg, tile_aligned=True)

        out = render_projected(proj, s_cfg, bg=bg)
        # Strip losses, EXACT: L1 decomposes over strips; SSIM windows
        # cross strip seams via halo exchange (ssim_strips), so the psum
        # mean equals the full-image objective.
        ll1 = l1_loss(out.image, gt_strip)
        loss = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (
            1.0 - ssim_strips(out.image, gt_strip, "tile")
        )
        loss = loss / (n_data * n_tile)
        aux = (radii_stats, out.num_instances, out.overflow,
               psnr(jnp.clip(out.image, 0, 1), gt_strip))
        return loss, aux

    def _grads_impl(params, cams, gts, probe):
        camera = jax.tree.map(lambda x: x[0], cams)
        gt_strip = gts[0]

        def lf(p, pr):
            return device_loss(p, camera, gt_strip, pr, cfg.sh_degree)

        (loss, aux), (grads, probe_grad) = jax.value_and_grad(
            lf, argnums=(0, 1), has_aux=True
        )(params, probe)
        radii_local, n_inst, ovf, psnr_strip = aux
        if shard_params:
            # grads/probe_grad arrive ALREADY globally summed (and
            # sharded) via the data/tile gathers' reduce_scatter VJPs;
            # radii_local is this tile row's shard — max over the batch
            # cameras, then keep this chip's own sub-block (tile-major
            # layout: within-row offset = data_idx)
            radii_row = jax.lax.pmax(radii_local, "data")
            sub = radii_row.shape[0] // n_data
            d = jax.lax.axis_index("data")
            radii = jax.lax.dynamic_slice_in_dim(radii_row, d * sub, sub)
        else:
            grads = jax.lax.psum(grads, ("data", "tile"))
            probe_grad = jax.lax.psum(probe_grad, ("data", "tile"))
            radii = jax.lax.pmax(radii_local, ("data", "tile"))
        loss = jax.lax.psum(loss, ("data", "tile"))
        stats = jnp.stack(
            [
                jnp.float32(n_inst),
                jnp.float32(ovf),
                psnr_strip,
            ]
        )
        stats = jax.lax.pmax(stats, ("data", "tile"))
        return loss, grads, probe_grad, (radii, stats)

    import optax

    def step(state: TrainState, cam_batch, gt_batch):
        cap = state.params.capacity
        if shard_params:
            pspec = _capacity_spec_tree(state.params, cap)
            vec_spec = PRIM_SPEC
        else:
            pspec = P()
            vec_spec = P()
        sharded_grads = jax.shard_map(
            _grads_impl,
            mesh=mesh,
            in_specs=(
                pspec, P("data"), P("data", None, "tile", None), vec_spec
            ),
            out_specs=(P(), pspec, vec_spec, (vec_spec, P())),
        )
        probe0 = jnp.zeros((cap, 2), jnp.float32)
        loss, grads, probe_grad, (radii, stats) = sharded_grads(
            state.params, cam_batch, gt_batch, probe0
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        dstate = densify_lib.update_stats(
            state.dstate, probe_grad, radii, params.mask,
            image_size=(rcfg.width, rcfg.height),
        )
        max_radii = jnp.maximum(state.max_radii, radii.astype(jnp.float32))
        new_state = TrainState(params, opt_state, dstate, max_radii)
        if shard_params:
            # keep every capacity-sized leaf pinned to the primitive
            # sharding so XLA never re-replicates state between steps
            new_state = jax.lax.with_sharding_constraint(
                new_state,
                jax.tree.map(
                    lambda s: NamedSharding(mesh, s),
                    _capacity_spec_tree(new_state, cap),
                ),
            )
        metrics = {
            "loss": loss,
            "num_instances": stats[0],
            "overflow": stats[1],
            "psnr_strip": stats[2],
        }
        return new_state, metrics

    return jax.jit(step)


def make_sharded_densify_step(
    mesh: Mesh, spatial_extent: float, cfg: GSTrainConfig
):
    """Device-side densification on PRIMITIVE-SHARDED state: every chip
    runs clone/split/prune on its own capacity/n_chips rows, allocating
    into its own free slots (fixed per-shard capacity — the SURVEY §7
    'fixed capacity per shard' design; a shard out of free slots drops
    requests independently, surfaced in info.n_dropped). No gathering, no
    re-replication; Adam-row surgery happens on the local moment rows.

    Returns step(state, key, use_size_prune) -> (state, DensifyInfo) for
    state placed with shard_train_state (pairs with
    make_sharded_train_step(shard_params=True))."""
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]

    @functools.partial(jax.jit, static_argnames=("use_size_prune",))
    def step(state: TrainState, key, use_size_prune: bool = False):
        specs = _capacity_spec_tree(state, state.params.capacity)

        def impl(st, key):
            axis_id = (
                jax.lax.axis_index("tile") * n_data
                + jax.lax.axis_index("data")
            )
            k = jax.random.fold_in(key, axis_id)
            dcfg = densify_lib.DensifyConfig(
                grad_threshold=cfg.densify_grad_threshold
            )
            params, opt_state, dstate, info = densify_lib.densify_and_prune(
                st.params, st.opt_state, st.dstate, k, spatial_extent,
                dcfg,
                max_screen_size=(
                    cfg.max_screen_size if use_size_prune else 0.0
                ),
                max_radii=st.max_radii,
            )
            info = jax.tree.map(
                lambda x: jax.lax.psum(x, ("data", "tile")), info
            )
            return (
                TrainState(
                    params, opt_state, dstate,
                    jnp.zeros_like(st.max_radii),
                ),
                info,
            )

        return jax.shard_map(
            impl, mesh=mesh, in_specs=(specs, P()), out_specs=(specs, P())
        )(state, key)

    return step


def shard_batch(mesh: Mesh, cam_batch: Camera, gt_batch: jnp.ndarray):
    """Place a camera/GT batch with the step's expected shardings."""
    cam_sharding = NamedSharding(mesh, P("data"))
    gt_sharding = NamedSharding(mesh, P("data", None, "tile", None))
    cams = jax.tree.map(
        lambda x: jax.device_put(x, cam_sharding), cam_batch
    )
    gts = jax.device_put(gt_batch, gt_sharding)
    return cams, gts


def stack_cameras(cams: List[Camera]) -> Camera:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
