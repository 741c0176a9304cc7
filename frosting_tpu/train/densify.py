"""Densification / pruning on the fixed-capacity arena, fully jit-able.

Functional re-design of the reference densifier (gaussian_splatting/scene/
gaussian_model.py:258-400, frosting_scene/sugar_densifier.py:10-251): instead
of concatenating/pruning tensors and performing Adam-state surgery, we keep a
static-capacity arena with a validity mask. Clone/split requests are matched
to free slots with an argsort-based allocator; Adam moments of (re)written
rows are zeroed via optimizer.reset_adam_rows.

Semantics parity:
  * stats: accumulate ||dL/dmean2d|| over iterations where the Gaussian was
    visible (radii > 0)  (sugar_densifier.py:156-164)
  * clone: grad >= threshold and max(scale) <= percent_dense * extent — copy
  * split: grad >= threshold and max(scale) >  percent_dense * extent — two
    children sampled from the Gaussian, scales / 1.6, original removed
  * prune: opacity < min_opacity, or screen radius / world size too large
  * opacity reset: clamp to <= 0.01 (gaussian_model reset_opacity)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from frosting_tpu.ops import quat as quat_ops
from frosting_tpu.scene.gaussians import GaussianParams, inverse_sigmoid
from frosting_tpu.train import optimizer as opt_lib


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 0.0002
    percent_dense: float = 0.01
    min_opacity: float = 0.005
    split_scale_div: float = 1.6  # 0.8 * N with N=2 children
    opacity_reset_value: float = 0.01


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifyState:
    grad_accum: jnp.ndarray  # [C]
    denom: jnp.ndarray  # [C]

    @staticmethod
    def zero(capacity: int) -> "DensifyState":
        return DensifyState(
            grad_accum=jnp.zeros((capacity,), jnp.float32),
            denom=jnp.zeros((capacity,), jnp.float32),
        )


def update_stats(
    state: DensifyState,
    means2d_grad: jnp.ndarray,  # [C, 2] grad of the screen-space probe
    radii: jnp.ndarray,  # [C] int32
    mask: jnp.ndarray,  # [C]
    image_size: tuple = (0, 0),  # (W, H); 0 = grads already NDC-scaled
) -> DensifyState:
    """Accumulate screen-space positional gradient norms
    (sugar_densifier.py:156-164). IMPORTANT unit parity: our probe grads
    are in PIXELS, but the reference's densify_grad_threshold (0.0002)
    applies to the CUDA rasterizer's mean2D grads, which carry the
    ndc2Pix Jacobian 0.5*W / 0.5*H (backward.cu ddelx_dx) — without this
    rescale the threshold is effectively ~W/2 times stricter and
    densification never fires."""
    visible = (radii > 0) & (mask > 0.5)
    g = means2d_grad
    w, h = image_size
    if w:
        g = g * jnp.asarray([0.5 * w, 0.5 * h], g.dtype)
    norm = jnp.linalg.norm(g, axis=-1)
    return DensifyState(
        grad_accum=state.grad_accum + jnp.where(visible, norm, 0.0),
        denom=state.denom + visible.astype(jnp.float32),
    )


class DensifyInfo(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray  # requests that found no free slot


def _park_row(p: GaussianParams, idx_mask: jnp.ndarray) -> GaussianParams:
    """Deactivate rows flagged by idx_mask (1 = kill)."""
    keep = 1.0 - idx_mask
    return dataclasses.replace(
        p,
        mask=p.mask * keep,
        means3d=jnp.where(idx_mask[:, None] > 0, 1e6, p.means3d),
        opacities_raw=jnp.where(idx_mask > 0, -15.0, p.opacities_raw),
    )


def densify_and_prune(
    params: GaussianParams,
    opt_state,
    state: DensifyState,
    key: jnp.ndarray,
    spatial_extent: float,
    cfg: DensifyConfig = DensifyConfig(),
    max_screen_size: float = 0.0,
    max_radii: jnp.ndarray | None = None,
) -> Tuple[GaussianParams, object, DensifyState, DensifyInfo]:
    c = params.capacity
    live = params.mask > 0.5
    grads = state.grad_accum / jnp.maximum(state.denom, 1.0)
    scales = jnp.exp(params.scales_log)
    max_scale = scales.max(axis=-1)
    opac = jax.nn.sigmoid(params.opacities_raw)

    # --- prune ---
    prune = live & (opac < cfg.min_opacity)
    if max_screen_size > 0.0 and max_radii is not None:
        prune |= live & (max_radii > max_screen_size)
        prune |= live & (max_scale > 0.1 * spatial_extent)
    params = _park_row(params, prune.astype(jnp.float32))
    live = params.mask > 0.5

    # --- candidates ---
    hot = live & (grads >= cfg.grad_threshold)
    small = max_scale <= cfg.percent_dense * spatial_extent
    clone = hot & small
    split = hot & ~small

    # Children of splits: sample inside the Gaussian (gaussian_model
    # densify_and_split: stds=scales, rotated by R).
    k1, k2 = jax.random.split(key)
    quats = quat_ops.normalize(params.quats_raw)

    def sample_child(k):
        eps = jax.random.normal(k, (c, 3)) * scales
        offs = jnp.einsum("nij,nj->ni", quat_ops.to_matrix(quats), eps)
        return params.means3d + offs

    child_scales_log = params.scales_log - jnp.log(cfg.split_scale_div)

    # child 1 overwrites the split original in place
    params = dataclasses.replace(
        params,
        means3d=jnp.where(split[:, None], sample_child(k1), params.means3d),
        scales_log=jnp.where(split[:, None], child_scales_log, params.scales_log),
    )

    # --- request list: clones (verbatim copies) + split child 2 ---
    req = clone | split
    req_params_means = jnp.where(split[:, None], sample_child(k2), params.means3d)
    req_scales_log = jnp.where(split[:, None], child_scales_log, params.scales_log)

    # allocator: match request rank to free-slot rank
    req_order = jnp.argsort(~req, stable=True)  # request rows first
    free = ~(params.mask > 0.5)
    free_order = jnp.argsort(~free, stable=True)  # free rows first
    n_req = jnp.sum(req)
    n_free = jnp.sum(free)
    n_place = jnp.minimum(n_req, n_free)
    slot_rank = jnp.arange(c)
    do_place = slot_rank < n_place
    src = req_order  # [c] source row for rank j
    dst = jnp.where(do_place, free_order, c)  # out-of-bounds drops

    def scatter_copy(dst_arr, src_arr):
        # non-placed ranks have dst == c and are dropped by the scatter
        vals = jnp.take(src_arr, src, axis=0)
        return dst_arr.at[dst].set(vals, mode="drop")

    new_params = GaussianParams(
        means3d=scatter_copy(params.means3d, req_params_means),
        sh_dc=scatter_copy(params.sh_dc, params.sh_dc),
        sh_rest=scatter_copy(params.sh_rest, params.sh_rest),
        scales_log=scatter_copy(params.scales_log, req_scales_log),
        quats_raw=scatter_copy(params.quats_raw, params.quats_raw),
        opacities_raw=scatter_copy(params.opacities_raw, params.opacities_raw),
        mask=params.mask.at[dst].set(1.0, mode="drop"),
    )

    # --- optimizer-state surgery: zero moments of rewritten rows ---
    touched = jnp.zeros((c,), jnp.float32)
    touched = touched + split.astype(jnp.float32)  # child-1 rewrites
    touched = touched.at[dst].add(do_place.astype(jnp.float32), mode="drop")
    touched = jnp.clip(touched + prune.astype(jnp.float32), 0.0, 1.0)
    field_masks = {
        f.name: touched
        for f in dataclasses.fields(GaussianParams)
        if f.name != "mask"
    }
    new_opt_state = opt_lib.reset_adam_rows(opt_state, field_masks)

    info = DensifyInfo(
        n_cloned=jnp.sum(clone).astype(jnp.int32),
        n_split=jnp.sum(split).astype(jnp.int32),
        n_pruned=jnp.sum(prune).astype(jnp.int32),
        n_dropped=(n_req - n_place).astype(jnp.int32),
    )
    return new_params, new_opt_state, DensifyState.zero(c), info


def reset_opacity(
    params: GaussianParams, opt_state, value: float = 0.01
) -> Tuple[GaussianParams, object]:
    """Clamp opacities to <= value and zero their Adam moments
    (gaussian_model reset_opacity — only the opacity group's state)."""
    new_raw = jnp.minimum(
        params.opacities_raw, inverse_sigmoid(jnp.asarray(value))
    )
    params = dataclasses.replace(params, opacities_raw=new_raw)
    opt_state = opt_lib.reset_adam_rows(
        opt_state, {"opacities_raw": jnp.ones_like(params.mask)}
    )
    return params, opt_state
