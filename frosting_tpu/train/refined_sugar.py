"""Refined (mesh-bound) SuGaR training — the reference's refined-SuGaR
stage (sugar_trainers/refine.py analogue; model binding from
sugar_model.py:186-360): flat Gaussians pinned to the extracted mesh at
fixed barycentric patterns, optimizing in-plane scales, 2D rotations,
opacity, SH, and optionally the mesh vertices themselves, against
L1 + D-SSIM. Export converts to plain Gaussian arrays for PLY / viewers.
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
from frosting_tpu.models.mesh_bound import (
    MeshBoundMeta,
    MeshBoundParams,
    activate_mesh_bound,
)
from frosting_tpu.ops.ssim import l1_loss, psnr, ssim
from frosting_tpu.raster import RasterConfig, render
from frosting_tpu.train.optimizer import expon_lr


@dataclasses.dataclass(frozen=True)
class MeshBoundTrainConfig:
    iterations: int = 2_000
    lambda_dssim: float = 0.2
    sh_degree: int = 3
    learn_verts: bool = False
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    lr_max_steps: int = 2_000
    eps: float = 1e-15
    white_background: bool = False
    log_every: int = 200


def make_mesh_bound_optimizer(
    cfg: MeshBoundTrainConfig, spatial_extent: float
) -> optax.GradientTransformation:
    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=cfg.eps)

    groups = {
        "verts": (
            adam(
                expon_lr(
                    cfg.position_lr_init * spatial_extent,
                    cfg.position_lr_final * spatial_extent,
                    max_steps=cfg.lr_max_steps,
                )
            )
            if cfg.learn_verts
            else optax.set_to_zero()
        ),
        "plane_scales_log": adam(cfg.scaling_lr),
        "complex_rot": adam(cfg.rotation_lr),
        "opacities_raw": adam(cfg.opacity_lr),
        "sh_dc": adam(cfg.feature_lr),
        "sh_rest": adam(cfg.feature_lr / 20.0),
    }

    def label_fn(params):
        return MeshBoundParams(
            **{f.name: f.name for f in dataclasses.fields(MeshBoundParams)}
        )

    return optax.multi_transform(groups, label_fn)


@functools.partial(
    jax.jit, static_argnames=("tx", "rcfg", "cfg", "n_per_triangle")
)
def mesh_bound_train_step(
    params: MeshBoundParams,
    opt_state,
    faces: jnp.ndarray,
    camera: Camera,
    gt_image: jnp.ndarray,
    tx,
    rcfg: RasterConfig,
    cfg: MeshBoundTrainConfig,
    n_per_triangle: int,
    thickness: float,
):
    bg = jnp.full((3,), 1.0 if cfg.white_background else 0.0, jnp.float32)
    meta = MeshBoundMeta(
        faces=faces, n_per_triangle=n_per_triangle, thickness=thickness
    )

    def loss_fn(p):
        means, scales, quats, opac, sh = activate_mesh_bound(p, meta)
        out = render(
            means, scales, quats, opac, sh, camera, rcfg, bg=bg,
            active_sh_degree=cfg.sh_degree,
        )
        loss = (1.0 - cfg.lambda_dssim) * l1_loss(out.image, gt_image) + (
            cfg.lambda_dssim
        ) * (1.0 - ssim(out.image, gt_image))
        return loss, {
            "psnr": psnr(jnp.clip(out.image, 0, 1), gt_image),
            "overflow": out.overflow,
        }

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    aux["loss"] = loss
    return params, opt_state, aux


def train(
    params: MeshBoundParams,
    meta: MeshBoundMeta,
    spatial_extent: float,
    cameras: List[Camera],
    gt_images: np.ndarray,
    rcfg: RasterConfig,
    cfg: MeshBoundTrainConfig = MeshBoundTrainConfig(),
    seed: int = 0,
    log_fn=print,
):
    tx = make_mesh_bound_optimizer(cfg, spatial_extent)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)
    gt_dev = jax.device_put(jnp.asarray(gt_images))
    history: List[Dict] = []
    order = rng.permutation(len(cameras))
    pos = 0
    t0 = time.time()
    for it in range(1, cfg.iterations + 1):
        if pos >= len(order):
            order = rng.permutation(len(cameras))
            pos = 0
        ci = int(order[pos])
        pos += 1
        params, opt_state, aux = mesh_bound_train_step(
            params, opt_state, meta.faces, cameras[ci], gt_dev[ci],
            tx, rcfg, cfg, meta.n_per_triangle, meta.thickness,
        )
        if it % cfg.log_every == 0 or it == cfg.iterations:
            m = {
                "iter": it,
                "loss": float(aux["loss"]),
                "psnr": float(aux["psnr"]),
                "iters_per_s": cfg.log_every / max(time.time() - t0, 1e-9),
            }
            t0 = time.time()
            history.append(m)
            if log_fn:
                log_fn(
                    f"[refined-sugar] it {m['iter']:6d} loss {m['loss']:.4f} "
                    f"psnr {m['psnr']:.2f} ({m['iters_per_s']:.1f} it/s)"
                )
    return params, history
