"""Vanilla 3DGS trainer — step 1 of the Frosting pipeline.

Functional re-design of gaussian_splatting/train.py:32-133: a jitted train
step (render -> L1 + lambda*D-SSIM -> per-group Adam) plus the interval
machinery (SH warm-up every 1000 iters, densify every 100 in [500, 15000),
opacity reset every 3000). Single camera per step, like the reference
(batch = 1 full image).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from frosting_tpu.cameras import Camera
from frosting_tpu.ops.ssim import l1_loss, psnr, ssim
from frosting_tpu.raster import RasterConfig, render
from frosting_tpu.scene.gaussians import GaussianParams, activate, create_from_pcd
from frosting_tpu.train import densify as densify_lib
from frosting_tpu.train import optimizer as opt_lib


@dataclasses.dataclass(frozen=True)
class GSTrainConfig:
    iterations: int = 7_000
    lambda_dssim: float = 0.2
    sh_degree: int = 3
    sh_increase_interval: int = 1_000
    densify_from: int = 500
    densify_until: int = 15_000
    densification_interval: int = 100
    densify_grad_threshold: float = 0.0002
    opacity_reset_interval: int = 3_000
    size_threshold_from: int = 3_000  # prune big screen-size points after
    max_screen_size: float = 20.0
    white_background: bool = False
    capacity: int = 1 << 18
    log_every: int = 200
    # failure recovery (greenfield vs the reference's save-only pickles,
    # SURVEY.md §5): periodic snapshots + auto-rollback on non-finite loss
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 1_000
    metrics_jsonl: Optional[str] = None


class TrainState(NamedTuple):
    params: GaussianParams
    opt_state: object
    dstate: densify_lib.DensifyState
    max_radii: jnp.ndarray  # [C] float32 running max screen radius


def init_state(
    points: np.ndarray,
    colors: np.ndarray,
    spatial_extent: float,
    cfg: GSTrainConfig,
) -> tuple[TrainState, optax.GradientTransformation]:
    params = create_from_pcd(
        points, colors, cfg.capacity, sh_degree=cfg.sh_degree
    )
    tx = opt_lib.make_gs_optimizer(spatial_extent)
    return (
        TrainState(
            params=params,
            opt_state=tx.init(params),
            dstate=densify_lib.DensifyState.zero(cfg.capacity),
            max_radii=jnp.zeros((cfg.capacity,), jnp.float32),
        ),
        tx,
    )


def _train_step_impl(
    state: TrainState,
    camera: Camera,
    gt_image: jnp.ndarray,  # [3, H, W]
    tx,
    rcfg: RasterConfig,
    cfg: GSTrainConfig,
    active_sh_degree: int,
):
    bg = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )
    probe0 = jnp.zeros((state.params.capacity, 2), jnp.float32)

    def loss_fn(params, probe):
        means, scales, quats, opac, sh = activate(params)
        # TRACED SH warm-up: zero the coefficients above the active
        # degree instead of statically truncating the basis — identical
        # math (zero coeffs kill the same basis terms) but ONE compiled
        # executable across the warm-up (the static form recompiled the
        # whole step at every sh_increase_interval, ~3 min each through
        # the remote helper — most of PSNR_BENCH's wall-clock).
        k_act = (active_sh_degree + 1) * (active_sh_degree + 1)
        sh = sh * (jnp.arange(sh.shape[1]) < k_act)[None, :, None]
        out = render(
            means, scales, quats, opac, sh, camera, rcfg,
            bg=bg, means2d_probe=probe,
        )
        ll1 = l1_loss(out.image, gt_image)
        loss = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (
            1.0 - ssim(out.image, gt_image)
        )
        return loss, out

    (loss, out), (grads, probe_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, probe0)

    # Device-side NaN guard: a non-finite loss step becomes a no-op update
    # instead of poisoning params/Adam state. This lets the host loop run
    # fully async — no per-iteration loss fetch (which serialized host and
    # device and cost 3x the measured step time at bench budgets).
    good = jnp.isfinite(loss)
    grads, probe_grad = jax.tree.map(
        lambda g: jnp.where(good, g, jnp.zeros_like(g)), (grads, probe_grad)
    )

    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params, opt_state = jax.tree.map(
        lambda new, old: jnp.where(good, new, old),
        (params, opt_state),
        (state.params, state.opt_state),
    )

    dstate = densify_lib.update_stats(
        state.dstate, probe_grad, out.radii, params.mask,
        image_size=(rcfg.width, rcfg.height),
    )
    max_radii = jnp.maximum(
        state.max_radii, out.radii.astype(jnp.float32)
    )
    metrics = {
        "loss": loss,
        "psnr": psnr(jnp.clip(out.image, 0.0, 1.0), gt_image),
        "overflow": out.overflow,
        "num_instances": out.num_instances,
    }
    return (
        TrainState(params, opt_state, dstate, max_radii),
        metrics,
    )


# active_sh_degree is TRACED (not static): the SH warm-up changes it at
# every sh_increase_interval and a static arg would recompile the step
_GS_STATICS = ("tx", "rcfg", "cfg")
# public entry point: safe to call repeatedly on the same state
train_step = functools.partial(jax.jit, static_argnames=_GS_STATICS)(
    _train_step_impl
)
# hot-loop variant: the whole TrainState (params + Adam moments + densify
# stats) is DONATED and updated in place; the train loop threads state
# linearly and snapshots via explicit copies
train_step_donated = functools.partial(
    jax.jit, static_argnames=_GS_STATICS, donate_argnames=("state",)
)(_train_step_impl)


@functools.partial(jax.jit, static_argnames=("spatial_extent", "cfg", "use_size_prune"))
def densify_step(
    state: TrainState,
    key,
    spatial_extent: float,
    cfg: GSTrainConfig,
    use_size_prune: bool,
):
    dcfg = densify_lib.DensifyConfig(
        grad_threshold=cfg.densify_grad_threshold
    )
    params, opt_state, dstate, info = densify_lib.densify_and_prune(
        state.params,
        state.opt_state,
        state.dstate,
        key,
        spatial_extent,
        dcfg,
        max_screen_size=cfg.max_screen_size if use_size_prune else 0.0,
        max_radii=state.max_radii,
    )
    return (
        TrainState(params, opt_state, dstate, jnp.zeros_like(state.max_radii)),
        info,
    )


def train(
    cameras: List[Camera],
    gt_images: np.ndarray,  # [n, 3, H, W]
    points: np.ndarray,
    colors: np.ndarray,
    spatial_extent: float,
    rcfg: RasterConfig,
    cfg: GSTrainConfig = GSTrainConfig(),
    seed: int = 0,
    log_fn=print,
) -> tuple[TrainState, List[Dict]]:
    """Python-side training driver. Returns final state + metric history."""
    from frosting_tpu.train import checkpoint as ckpt_lib
    from frosting_tpu.utils.profiling import MetricsLogger

    state, tx = init_state(points, colors, spatial_extent, cfg)
    key = jax.random.key(seed)
    rng = np.random.default_rng(seed)
    history: List[Dict] = []
    gt_dev = jax.device_put(jnp.asarray(gt_images))
    mlog = MetricsLogger(cfg.metrics_jsonl)
    snapshot = None  # in-memory rollback point for NaN recovery
    last_ckpt_path = None
    if cfg.checkpoint_dir:
        import os

        os.makedirs(cfg.checkpoint_dir, exist_ok=True)

    order = rng.permutation(len(cameras))
    pos = 0
    t0 = time.time()
    for it in range(1, cfg.iterations + 1):
        if pos >= len(order):
            order = rng.permutation(len(cameras))
            pos = 0
        ci = int(order[pos])
        pos += 1

        active_deg = min(cfg.sh_degree, (it - 1) // cfg.sh_increase_interval)
        # NO host sync here: train_step carries a device-side NaN guard
        # (non-finite loss => no-op update), so the loop dispatches ahead
        # of the device and finiteness is only checked at log cadence.
        # State buffers are DONATED (in-place update); the snapshot below
        # is an explicit copy so rollback survives donation.
        state, metrics = train_step_donated(
            state, cameras[ci], gt_dev[ci], tx, rcfg, cfg, active_deg
        )

        if (
            cfg.checkpoint_every > 0
            and it % cfg.checkpoint_every == 0
        ):
            snapshot = jax.tree.map(jnp.copy, state)
            if cfg.checkpoint_dir:
                last_ckpt_path = f"{cfg.checkpoint_dir}/gs_{it:07d}.npz"
                ckpt_lib.save_npz(last_ckpt_path, state.params)

        if (
            cfg.densify_from <= it < cfg.densify_until
            and it % cfg.densification_interval == 0
        ):
            key, sub = jax.random.split(key)
            state, info = densify_step(
                state,
                sub,
                spatial_extent,
                cfg,
                use_size_prune=it > cfg.size_threshold_from,
            )

        if it % cfg.opacity_reset_interval == 0 and it < cfg.densify_until:
            params, opt_state = densify_lib.reset_opacity(
                state.params, state.opt_state
            )
            state = state._replace(params=params, opt_state=opt_state)

        if it % cfg.log_every == 0 or it == cfg.iterations:
            loss_val = float(metrics["loss"])
            if not np.isfinite(loss_val) and snapshot is not None:
                # the in-step guard makes a bad step a no-op, so a
                # non-finite LOGGED loss means the scene itself is
                # producing NaNs — restore the last good snapshot
                if log_fn:
                    log_fn(f"[gs] it {it}: non-finite loss, rolling back")
                # copy: the next donated step consumes these buffers, and
                # the snapshot must survive for possible further rollbacks
                state = jax.tree.map(jnp.copy, snapshot)
            m = {
                "iter": it,
                "loss": loss_val,
                "psnr": float(metrics["psnr"]),
                "n_active": int(np.asarray(state.params.num_active())),
                "overflow": bool(metrics["overflow"]),
                "iters_per_s": cfg.log_every / max(time.time() - t0, 1e-9),
            }
            t0 = time.time()
            history.append(m)
            mlog.log(it, **{k: v for k, v in m.items() if k != "iter"})
            if log_fn:
                log_fn(
                    f"[gs] it {m['iter']:6d} loss {m['loss']:.4f} "
                    f"psnr {m['psnr']:.2f} n {m['n_active']} "
                    f"({m['iters_per_s']:.1f} it/s)"
                )
    mlog.close()
    if cfg.checkpoint_dir:
        ckpt_lib.save_npz(f"{cfg.checkpoint_dir}/gs_final.npz", state.params)
    return state, history


def evaluate(
    state: TrainState,
    cameras: List[Camera],
    gt_images: np.ndarray,
    rcfg: RasterConfig,
    cfg: GSTrainConfig,
) -> Dict[str, float]:
    @jax.jit
    def render_one(params, camera):
        bg = jnp.full(
            (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
        )
        means, scales, quats, opac, sh = activate(params)
        return render(
            means, scales, quats, opac, sh, camera, rcfg, bg=bg,
            active_sh_degree=cfg.sh_degree,
        ).image

    psnrs, ssims = [], []
    for cam, gt in zip(cameras, gt_images):
        img = jnp.clip(render_one(state.params, cam), 0.0, 1.0)
        gt = jnp.asarray(gt)
        psnrs.append(float(psnr(img, gt)))
        ssims.append(float(ssim(img, gt)))
    return {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
    }
