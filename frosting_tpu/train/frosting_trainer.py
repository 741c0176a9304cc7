"""Frosting refinement — step 5 of the pipeline.

Re-creates refined_training (frosting_trainers/refine.py:21-633): optimize
bary coords / scales / quats / opacities / SH of the shell-constrained
Gaussians (plus background Gaussians) against L1 + D-SSIM, with optional
mesh occlusion culling using per-camera visible-face sets precomputed with
the mesh rasterizer (refine.py:413-455; cull applied every 2nd iteration,
refine.py:487-492). No densification during refinement (refine.py docstring,
SURVEY.md §2 #20).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from frosting_tpu.cameras import Camera
from frosting_tpu.models.frosting import (
    FrostingMeta,
    FrostingParams,
    activate_frosting,
)
from frosting_tpu.ops.ssim import l1_loss, psnr, ssim
from frosting_tpu.raster import RasterConfig, render
from frosting_tpu.train.optimizer import expon_lr


@dataclasses.dataclass(frozen=True)
class FrostingTrainConfig:
    iterations: int = 15_000  # long preset; 2k short / 7k medium (train.py:140)
    lambda_dssim: float = 0.2
    sh_degree: int = 3
    learn_shell: bool = False
    # group LRs (frosting_optimizer.py:52-143 + 3DGS OptimizationParams)
    bary_lr_init: float = 5e-3
    bary_lr_final: float = 5e-5
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    lr_max_steps: int = 15_000
    eps: float = 1e-15
    white_background: bool = False
    # --regularize_shell (refine.py:144,513-515; factor train.py:68). NOTE:
    # the reference applies mesh_normal_consistency to shell_base, whose
    # verts never join the optimizer (the param group is commented out,
    # frosting_optimizer.py:76) — the term is functionally inert there.
    # Here it regularizes the surfaces that actually TRAIN under
    # learn_shell: the inner/outer offset meshes (verts + dist * normal).
    regularize_shell: bool = False
    normal_consistency_factor: float = 0.1
    # occlusion culling (refine.py:136): apply every 2nd iteration
    use_occlusion_culling: bool = False
    cull_every: int = 2
    # derive a smaller-capacity RasterConfig for the culled iterations from
    # the measured per-camera culled instance counts, so every
    # capacity-proportional cost (instance buffers, sorts, backward
    # reduction) shrinks with the visible subset. Ignored when an explicit
    # rcfg_culled is passed to train().
    auto_culled_capacity: bool = True
    culled_capacity_safety: float = 1.4
    log_every: int = 200


def make_frosting_optimizer(
    cfg: FrostingTrainConfig, spatial_extent: float
) -> optax.GradientTransformation:
    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=cfg.eps)

    shell_lr = (
        expon_lr(
            cfg.position_lr_init * spatial_extent,
            cfg.position_lr_final * spatial_extent,
            max_steps=cfg.lr_max_steps,
        )
        if cfg.learn_shell
        else 0.0
    )
    groups = {
        "shell_verts": optax.set_to_zero(),
        "inner_dist": adam(shell_lr) if cfg.learn_shell else optax.set_to_zero(),
        "outer_dist": adam(shell_lr) if cfg.learn_shell else optax.set_to_zero(),
        "bary_logits": adam(
            expon_lr(cfg.bary_lr_init, cfg.bary_lr_final, max_steps=cfg.lr_max_steps)
        ),
        "sh_dc": adam(cfg.feature_lr),
        "sh_rest": adam(cfg.feature_lr / 20.0),
        "opacities_raw": adam(cfg.opacity_lr),
        "scales_log": adam(cfg.scaling_lr),
        "quats_raw": adam(cfg.rotation_lr),
        # background-Gaussian groups (frosting_optimizer.py:85-91): bg points
        # follow the expon position schedule x spatial extent, the rest get
        # the standard 3DGS group LRs
        "bg_means3d": adam(
            expon_lr(
                cfg.position_lr_init * spatial_extent,
                cfg.position_lr_final * spatial_extent,
                max_steps=cfg.lr_max_steps,
            )
        ),
        "bg_sh_dc": adam(cfg.feature_lr),
        "bg_sh_rest": adam(cfg.feature_lr / 20.0),
        "bg_opacities_raw": adam(cfg.opacity_lr),
        "bg_scales_log": adam(cfg.scaling_lr),
        "bg_quats_raw": adam(cfg.rotation_lr),
        "bg_mask": optax.set_to_zero(),
    }

    def label_fn(params: FrostingParams):
        from frosting_tpu.scene.gaussians import GaussianParams

        labels = {
            f.name: f.name
            for f in dataclasses.fields(FrostingParams)
            if f.name != "bg"
        }
        bg_labels = None
        if params.bg is not None:
            bg_labels = GaussianParams(
                **{
                    f.name: f"bg_{f.name}"
                    for f in dataclasses.fields(GaussianParams)
                }
            )
        return FrostingParams(**labels, bg=bg_labels)

    return optax.multi_transform(groups, label_fn)


def _step_from_loss(loss_fn, params, opt_state, tx):
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    aux["loss"] = loss
    return params, opt_state, aux


def _shell_normal_consistency(
    p: FrostingParams, meta: FrostingMeta, nc_pairs: jnp.ndarray,
    cfg: FrostingTrainConfig,
):
    """Normal-consistency of the learned inner/outer offset surfaces —
    gradients flow to inner_dist/outer_dist (and shell_verts when those
    train). See the regularize_shell config note."""
    from frosting_tpu.ops import mesh as mesh_ops

    vn = mesh_ops.vertex_normals(p.shell_verts, meta.faces)
    l_out = mesh_ops.normal_consistency_loss(
        p.shell_verts + p.outer_dist[:, None] * vn, meta.faces, nc_pairs
    )
    l_in = mesh_ops.normal_consistency_loss(
        p.shell_verts + p.inner_dist[:, None] * vn, meta.faces, nc_pairs
    )
    return cfg.normal_consistency_factor * 0.5 * (l_out + l_in)


def _photometric(out, gt_image, cfg: FrostingTrainConfig):
    loss = (1.0 - cfg.lambda_dssim) * l1_loss(out.image, gt_image) + (
        cfg.lambda_dssim
    ) * (1.0 - ssim(out.image, gt_image))
    return loss, {
        "psnr": psnr(jnp.clip(out.image, 0, 1), gt_image),
        "overflow": out.overflow,
    }


def _frosting_train_step_impl(
    params: FrostingParams,
    opt_state,
    meta: FrostingMeta,
    camera: Camera,
    gt_image: jnp.ndarray,
    gauss_mask: jnp.ndarray,  # [N_total] 1 = render
    tx,
    rcfg: RasterConfig,
    cfg: FrostingTrainConfig,
    active_sh_degree: int,
    nc_pairs: jnp.ndarray | None = None,
):
    bg = jnp.full((3,), 1.0 if cfg.white_background else 0.0, jnp.float32)

    def loss_fn(p):
        means, scales, quats, opac, sh = activate_frosting(p, meta)
        opac = opac * gauss_mask
        out = render(
            means, scales, quats, opac, sh, camera, rcfg, bg=bg,
            active_sh_degree=active_sh_degree,
        )
        loss, aux = _photometric(out, gt_image, cfg)
        if cfg.regularize_shell and nc_pairs is not None:
            loss = loss + _shell_normal_consistency(p, meta, nc_pairs, cfg)
        return loss, aux

    return _step_from_loss(loss_fn, params, opt_state, tx)


_STEP_STATICS = ("tx", "rcfg", "cfg", "active_sh_degree")
# public entry point: safe to call repeatedly on the same params
frosting_train_step = functools.partial(
    jax.jit, static_argnames=_STEP_STATICS
)(_frosting_train_step_impl)
# hot-loop variant: params/opt_state buffers are DONATED (updated in
# place; at 2M gaussians the non-donated step copies ~0.5 GB of params +
# 1 GB of Adam state every iteration). Callers must not touch the inputs
# after the call — the train loop below threads them linearly.
frosting_train_step_donated = functools.partial(
    jax.jit,
    static_argnames=_STEP_STATICS,
    donate_argnames=("params", "opt_state"),
)(_frosting_train_step_impl)


def precompute_visibility(
    params: FrostingParams,
    meta: FrostingMeta,
    cameras: List[Camera],
    rcfg: RasterConfig,
) -> np.ndarray:
    """[n_cams, N_total] per-camera gaussian visibility from shell-face
    visibility (refine.py:413-455): a frosting Gaussian is kept if its
    cell's face is seen by the camera; background Gaussians always kept."""
    from frosting_tpu.ops import mesh_raster

    n_f = params.bary_logits.shape[0]
    n_bg = 0 if params.bg is None else params.bg.capacity
    out = np.ones((len(cameras), n_f + n_bg), np.float32)
    faces_np = np.asarray(meta.faces)
    for i, cam in enumerate(cameras):
        frags = mesh_raster.rasterize_mesh(
            params.shell_verts, meta.faces, cam, rcfg
        )
        seen = np.zeros((faces_np.shape[0] + 1,), bool)
        pf = np.asarray(frags.pix_to_face).ravel()
        seen[pf[pf >= 0]] = True
        out[i, :n_f] = seen[np.asarray(meta.cell_idx)]
    return out


def derive_culled_config(
    params: FrostingParams,
    meta: FrostingMeta,
    cameras: List[Camera],
    vis_masks,
    rcfg: RasterConfig,
    safety: float = 1.4,
    max_probe_cameras: int = 16,
) -> RasterConfig:
    """Measure the per-camera CULLED instance count and size a dedicated
    RasterConfig for the culled iterations (the one-time probes cost a few
    preprocess passes; the reference's analogous precompute is the
    per-camera face-set pass, refine.py:413-455). Falls back to rcfg when
    the measured need isn't meaningfully smaller."""
    import dataclasses as _dc

    import jax as _jax

    from frosting_tpu.raster.render import (
        autotune_max_instances,
        count_instances,
    )

    @_jax.jit
    def probe(p, mask, cam):
        means, scales, quats, opac, sh = activate_frosting(p, meta)
        return count_instances(
            means, scales, quats, opac * mask, sh, cam, rcfg
        )

    stride = max(1, len(cameras) // max_probe_cameras)
    n_max = 0
    for i in range(0, len(cameras), stride):
        n_max = max(n_max, int(probe(params, vis_masks[i], cameras[i])))
    cap = autotune_max_instances(n_max, rcfg.chunk, safety=safety)
    if cap >= rcfg.max_instances:
        return rcfg
    return _dc.replace(rcfg, max_instances=cap)


def train(
    params: FrostingParams,
    meta: FrostingMeta,
    spatial_extent: float,
    cameras: List[Camera],
    gt_images: np.ndarray,
    rcfg: RasterConfig,
    cfg: FrostingTrainConfig = FrostingTrainConfig(),
    start_iteration: int = 0,
    seed: int = 0,
    log_fn=print,
    rcfg_culled: RasterConfig | None = None,
):
    """rcfg_culled: optional smaller-capacity RasterConfig for the culled
    iterations — every capacity-proportional cost (instance buffers, sorts,
    backward reduction) shrinks with the visible subset, not just the
    blend. Defaults to rcfg."""
    # the loop's donated steps consume their input buffers; copy once so
    # the CALLER's params (e.g. the freshly-initialized frosting, which
    # callers may also export/inspect) stay valid
    params = jax.tree.map(jnp.copy, params)
    tx = make_frosting_optimizer(cfg, spatial_extent)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)
    gt_dev = jax.device_put(jnp.asarray(gt_images))

    n_frosting = params.bary_logits.shape[0]
    n_total = n_frosting + (0 if params.bg is None else params.bg.capacity)
    ones_mask = jnp.ones((n_total,), jnp.float32)
    nc_pairs = None
    if cfg.regularize_shell:
        from frosting_tpu.ops import mesh as mesh_ops

        nc_pairs = jax.device_put(
            jnp.asarray(
                mesh_ops.adjacent_face_pairs(np.asarray(meta.faces))
            )
        )
    vis_masks = None
    if cfg.use_occlusion_culling:
        # Per-camera visibility masks zero the opacity of unseen-cell
        # Gaussians; the opacity-aware rect cull (raster/preprocess.py)
        # then emits ZERO instances for them, so the culled step's
        # binning/blend genuinely run on ~the visible subset
        # (refine.py:487-492; README.md:204) — no gather/scatter of the
        # parameter arrays (a compacted-subset gather path was measured
        # to eat most of the savings in per-row gather + backward
        # scatter-add overhead).
        vis_masks = jax.device_put(
            jnp.asarray(precompute_visibility(params, meta, cameras, rcfg))
        )
        if rcfg_culled is None and cfg.auto_culled_capacity:
            rcfg_culled = derive_culled_config(
                params, meta, cameras, vis_masks, rcfg,
                safety=cfg.culled_capacity_safety,
            )
            if log_fn and rcfg_culled is not rcfg:
                log_fn(
                    f"[frosting] culled instance capacity "
                    f"{rcfg_culled.max_instances} (full "
                    f"{rcfg.max_instances})"
                )

    history: List[Dict] = []
    order = rng.permutation(len(cameras))
    pos = 0
    t0 = time.time()
    for it in range(start_iteration + 1, start_iteration + cfg.iterations + 1):
        if pos >= len(order):
            order = rng.permutation(len(cameras))
            pos = 0
        ci = int(order[pos])
        pos += 1
        if vis_masks is not None and it % cfg.cull_every == 0:
            params, opt_state, aux = frosting_train_step_donated(
                params, opt_state, meta, cameras[ci], gt_dev[ci],
                vis_masks[ci], tx, rcfg_culled or rcfg, cfg,
                cfg.sh_degree, nc_pairs,
            )
        else:
            params, opt_state, aux = frosting_train_step_donated(
                params, opt_state, meta, cameras[ci], gt_dev[ci], ones_mask,
                tx, rcfg, cfg, cfg.sh_degree, nc_pairs,
            )
        if (it - start_iteration) % cfg.log_every == 0 or it == (
            start_iteration + cfg.iterations
        ):
            m = {
                "iter": it,
                "loss": float(aux["loss"]),
                "psnr": float(aux["psnr"]),
                # checked at log cadence only (a per-step host read would
                # pay the dispatch round-trip every iteration)
                "overflow": bool(aux["overflow"]),
                "iters_per_s": cfg.log_every / max(time.time() - t0, 1e-9),
            }
            if m["overflow"] and log_fn:
                # capacity overflow silently CLIPS rendering; at 2M+
                # gaussians this must be surfaced, not ignored
                log_fn(
                    f"[frosting] WARNING it {it}: instance capacity "
                    f"overflow (max_instances={rcfg.max_instances}) — "
                    "rendering clipped, raise RasterConfig.max_instances"
                )
            t0 = time.time()
            history.append(m)
            if log_fn:
                log_fn(
                    f"[frosting] it {m['iter']:6d} loss {m['loss']:.4f} "
                    f"psnr {m['psnr']:.2f} ({m['iters_per_s']:.1f} it/s)"
                )
    return params, history
