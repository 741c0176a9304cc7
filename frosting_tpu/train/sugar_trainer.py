"""Coarse SuGaR training — step 2 of the pipeline (density regularization).

Re-creates frosting_trainers/coarse_density.py:17-839 functionally: continue
optimizing a 3DGS model with (a) photometric L1+D-SSIM, (b) entropy
regularization on visible opacities in [start, end), (c) from
`sdf_from`: density-mode SDF estimation + better-normal losses over points
sampled in visible Gaussians, with KNN-16 neighbor sets reset every 500
iters, and (d) one hard opacity prune (op < 0.5) at `hard_prune_at`
(coarse_density.py:199-202, 490-501). No densification when starting from a
trained 3DGS (densify_until=7000 < start iter).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from frosting_tpu.cameras import Camera
from frosting_tpu.models import sugar as sugar_lib
from frosting_tpu.ops import knn as knn_lib
from frosting_tpu.ops.ssim import l1_loss, psnr, ssim
from frosting_tpu.raster import RasterConfig, render
from frosting_tpu.scene.gaussians import GaussianParams, activate
from frosting_tpu.train import optimizer as opt_lib


@dataclasses.dataclass(frozen=True)
class SugarTrainConfig:
    iterations: int = 15_000
    start_iteration: int = 7_000  # continues from the 3DGS checkpoint
    lambda_dssim: float = 0.2
    sh_degree: int = 3
    # entropy regularization (coarse_density.py:106-110)
    entropy_from: int = 7_000
    entropy_until: int = 9_000
    entropy_factor: float = 0.1
    # regularization method: "density" (coarse_density.py), "sdf"
    # (coarse_sdf.py), or "dn_consistency" (density + depth-normal loss,
    # coarse_density_and_dn_consistency.py)
    method: str = "density"
    dn_consistency_factor: float = 0.05
    spatial_extent: float = 1.0  # used by the sdf-mode loss scaling
    # sdf regularization (coarse_density.py:112-160): regularize_from
    # opens the regularized window (KNN tracking refresh cadence);
    # sdf_from is when the estimation/better-normal losses activate
    regularize_from: int = 7_000
    sdf_from: int = 9_000
    sdf_estimation_factor: float = 0.2
    sdf_better_normal_factor: float = 0.2
    n_sdf_samples: int = 200_000
    sdf_sampling_scale_factor: float = 1.5
    beta_mode: str = "average"
    knn_k: int = 16
    reset_neighbors_every: int = 500
    # hard prune (coarse_density.py:199-202)
    hard_prune_at: int = 9_000
    hard_prune_threshold: float = 0.5
    white_background: bool = False
    log_every: int = 200


def _sugar_train_step_impl(
    params: GaussianParams,
    opt_state,
    camera: Camera,
    gt_image: jnp.ndarray,
    knn_idx: jnp.ndarray,
    key,
    tx,
    rcfg: RasterConfig,
    cfg: SugarTrainConfig,
    active_sh_degree: int,
    phase: str,  # "photo" | "entropy" | "sdf"
):
    bg = jnp.full((3,), 1.0 if cfg.white_background else 0.0, jnp.float32)

    def loss_fn(p):
        means, scales, quats, opac, sh = activate(p)
        out = render(
            means, scales, quats, opac, sh, camera, rcfg, bg=bg,
            active_sh_degree=active_sh_degree,
        )
        loss = (1.0 - cfg.lambda_dssim) * l1_loss(out.image, gt_image) + (
            cfg.lambda_dssim
        ) * (1.0 - ssim(out.image, gt_image))
        visible = out.radii > 0

        if phase == "entropy":
            # logit-space entropy: exact and NaN-free even when f32
            # sigmoid saturates to 1.0 (see entropy_loss_from_logits)
            loss = loss + cfg.entropy_factor * (
                sugar_lib.entropy_loss_from_logits(
                    p.opacities_raw, visible & (p.mask > 0.5)
                )
            )
        if phase == "sdf":
            inp = sugar_lib.sample_sdf_points(
                key, means, scales, quats, knn_idx,
                visible & (p.mask > 0.5), cfg.n_sdf_samples,
                cfg.sdf_sampling_scale_factor,
            )
            if cfg.method == "sdf":
                # sdf-mode: depth-anchored |sdf| loss with gradients
                # through the rendered depth (coarse_sdf.py:577-650)
                depth_map, _nm, _acc = sugar_lib.render_depth_normal_maps(
                    means, scales, quats, opac, camera, rcfg
                )
                loss = loss + cfg.sdf_estimation_factor * (
                    sugar_lib.sdf_estimation_sdf_mode_loss(
                        inp, means, scales, quats, opac, depth_map,
                        camera, rcfg, cfg.spatial_extent,
                        beta_mode=cfg.beta_mode,
                    )
                )
            else:
                loss = loss + cfg.sdf_estimation_factor * (
                    sugar_lib.sdf_estimation_density_loss(
                        inp, means, scales, quats, opac,
                        beta_mode=cfg.beta_mode,
                    )
                )
            loss = loss + cfg.sdf_better_normal_factor * (
                sugar_lib.better_normal_loss(inp, means, scales, quats, opac)
            )
            if cfg.method == "dn_consistency":
                depth_map, normal_map, acc = (
                    sugar_lib.render_depth_normal_maps(
                        means, scales, quats, opac, camera, rcfg
                    )
                )
                loss = loss + cfg.dn_consistency_factor * (
                    sugar_lib.dn_consistency_loss(
                        depth_map, normal_map, acc, camera, rcfg
                    )
                )
        aux = {
            "psnr": psnr(jnp.clip(out.image, 0, 1), gt_image),
            "overflow": out.overflow,
        }
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    aux["loss"] = loss
    return params, opt_state, aux


_SUGAR_STATICS = ("tx", "rcfg", "cfg", "active_sh_degree", "phase")
# public entry point: safe to call repeatedly on the same params
sugar_train_step = functools.partial(
    jax.jit, static_argnames=_SUGAR_STATICS
)(_sugar_train_step_impl)
# hot-loop variant: donates params/opt_state (in-place Adam update, no
# per-step full-state copy); the train loop threads them linearly
sugar_train_step_donated = functools.partial(
    jax.jit,
    static_argnames=_SUGAR_STATICS,
    donate_argnames=("params", "opt_state"),
)(_sugar_train_step_impl)


@jax.jit
def hard_prune(params: GaussianParams, threshold: float = 0.5):
    """Park all Gaussians below the hard opacity threshold."""
    from frosting_tpu.train import densify as densify_lib

    kill = (jax.nn.sigmoid(params.opacities_raw) < threshold) & (
        params.mask > 0.5
    )
    return densify_lib._park_row(params, kill.astype(jnp.float32))


def compute_knn(params: GaussianParams, k: int = 16) -> jnp.ndarray:
    """KNN over live Gaussian centers; dead arena slots are masked out so
    they neither distort the Morton bbox nor appear as neighbors."""
    idx, _ = knn_lib.knn(params.means3d, k=k, valid=params.mask > 0.5)
    return idx


def train(
    params: GaussianParams,
    spatial_extent: float,
    cameras: List[Camera],
    gt_images: np.ndarray,
    rcfg: RasterConfig,
    cfg: SugarTrainConfig = SugarTrainConfig(),
    seed: int = 0,
    log_fn=print,
):
    """Python driver for the coarse stage. `params` comes from the 3DGS
    stage (vanilla checkpoint)."""
    # the loop's donated steps consume their input buffers; copy once so
    # the CALLER's params (e.g. pipeline's gs_state) stay valid
    params = jax.tree.map(jnp.copy, params)
    tx = opt_lib.make_gs_optimizer(spatial_extent)
    opt_state = tx.init(params)
    key = jax.random.key(seed)
    rng = np.random.default_rng(seed)
    gt_dev = jax.device_put(jnp.asarray(gt_images))
    knn_idx = compute_knn(params, cfg.knn_k)
    history: List[Dict] = []

    order = rng.permutation(len(cameras))
    pos = 0
    t0 = time.time()
    for it in range(cfg.start_iteration, cfg.iterations + 1):
        if pos >= len(order):
            order = rng.permutation(len(cameras))
            pos = 0
        ci = int(order[pos])
        pos += 1

        # KNN tracking is refreshed through the whole REGULARIZED window
        # (from regularize_from, not only once the sdf losses kick in at
        # sdf_from) — the reference's reset_neighbors cadence spans the
        # full coarse phase (coarse_density.py:184-189, 563-565)
        if it > cfg.regularize_from and it % cfg.reset_neighbors_every == 0:
            knn_idx = compute_knn(params, cfg.knn_k)

        if it == cfg.hard_prune_at:
            params = hard_prune(params, cfg.hard_prune_threshold)
            knn_idx = compute_knn(params, cfg.knn_k)

        if cfg.entropy_from < it < cfg.entropy_until:
            phase = "entropy"
        elif it > cfg.sdf_from:
            phase = "sdf"
        else:
            phase = "photo"

        key, sub = jax.random.split(key)
        params, opt_state, aux = sugar_train_step_donated(
            params, opt_state, cameras[ci], gt_dev[ci], knn_idx, sub,
            tx, rcfg, cfg, cfg.sh_degree, phase,
        )

        if it % cfg.log_every == 0 or it == cfg.iterations:
            m = {
                "iter": it,
                "loss": float(aux["loss"]),
                "psnr": float(aux["psnr"]),
                "phase": phase,
                "n_active": int(np.asarray(params.num_active())),
                "iters_per_s": cfg.log_every / max(time.time() - t0, 1e-9),
            }
            t0 = time.time()
            history.append(m)
            if log_fn:
                log_fn(
                    f"[sugar] it {m['iter']:6d} [{phase}] loss "
                    f"{m['loss']:.4f} psnr {m['psnr']:.2f} n {m['n_active']}"
                )
    return params, history
