"""Per-group Adam with the 3DGS exponential position schedule, on optax.

Re-creates the reference optimizers (gaussian_model.py:149-175,
frosting_scene/sugar_optimizer.py:45-118, frosting_optimizer.py:52-143) as a
single optax.multi_transform over the parameter pytree. Adam eps = 1e-15 as
in the reference; the position LR is the JaxNeRF log-lerp schedule scaled by
the scene's spatial extent.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax


def expon_lr(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """JaxNeRF-style log-linear decay with optional sine delay ramp
    (frosting_utils/general_utils.py:22-56), as an optax schedule."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t
        )
        return delay * log_lerp

    return schedule


@dataclasses.dataclass(frozen=True)
class GSOptimConfig:
    """Reference defaults (gaussian_splatting/arguments/__init__.py:74-81)."""

    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    eps: float = 1e-15


def _adam(lr, eps):
    return optax.adam(learning_rate=lr, b1=0.9, b2=0.999, eps=eps)


def make_gs_optimizer(
    spatial_extent: float, cfg: GSOptimConfig = GSOptimConfig()
) -> optax.GradientTransformation:
    """Optimizer over a GaussianParams pytree. The `mask` leaf is frozen."""
    lrs: Dict[str, optax.GradientTransformation] = {
        "means3d": _adam(
            expon_lr(
                cfg.position_lr_init * spatial_extent,
                cfg.position_lr_final * spatial_extent,
                lr_delay_mult=cfg.position_lr_delay_mult,
                max_steps=cfg.position_lr_max_steps,
            ),
            cfg.eps,
        ),
        "sh_dc": _adam(cfg.feature_lr, cfg.eps),
        "sh_rest": _adam(cfg.feature_lr / 20.0, cfg.eps),
        "opacities_raw": _adam(cfg.opacity_lr, cfg.eps),
        "scales_log": _adam(cfg.scaling_lr, cfg.eps),
        "quats_raw": _adam(cfg.rotation_lr, cfg.eps),
        "mask": optax.set_to_zero(),
    }

    def label_fn(params):
        return type(params)(
            means3d="means3d",
            sh_dc="sh_dc",
            sh_rest="sh_rest",
            scales_log="scales_log",
            quats_raw="quats_raw",
            opacities_raw="opacities_raw",
            mask="mask",
        )

    return optax.multi_transform(lrs, label_fn)


def reset_adam_rows(opt_state, field_masks: Dict[str, jnp.ndarray]):
    """Zero Adam moments for arena rows, per parameter-dataclass field.

    `field_masks` maps param field names (e.g. "opacities_raw") to [C] row
    masks (1 = reset that row's moments). The reference performs
    optimizer-state "surgery" when densifying/pruning (sugar_densifier.py:
    48-128 cat/prune of exp_avg); with a fixed-capacity arena we instead
    zero the moment rows of slots that were (re)allocated.
    """

    def scale_rows(x, m):
        if not hasattr(x, "ndim"):  # optax MaskedNode in multi_transform
            return x
        keep = 1.0 - m
        return x * keep.reshape((-1,) + (1,) * (x.ndim - 1))

    def fix_moments(moments):
        upd = {
            f: scale_rows(getattr(moments, f), m)
            for f, m in field_masks.items()
        }
        return dataclasses.replace(moments, **upd)

    def map_state(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=s.count, mu=fix_moments(s.mu), nu=fix_moments(s.nu)
            )
        return s

    return jax.tree.map(
        map_state,
        opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState),
    )
