"""Top-level differentiable render: preprocess -> bin -> blend -> compose.

The custom-VJP boundary wraps only the non-autodiffable middle (binning +
chunked blend). Projection / covariance / SH gradients flow through plain JAX
autodiff of preprocess.py; the blend backward produces per-Gaussian gradients
of (mean2d, conic, color, opacity) via Pallas (or the pure-JAX twin) plus a
segment-sum over instances — the TPU replacement for the reference's
atomicAdd scatters (backward.cu:523-554).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import Camera
from frosting_tpu.raster import blend_jax
from frosting_tpu.raster.binning import Binned, bin_gaussians
from frosting_tpu.raster.config import (
    INSTANCE_FIELDS_USED,
    INSTANCE_WIDTH,
    RasterConfig,
)
from frosting_tpu.raster.preprocess import Projected, pack_fields, preprocess


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # [3, H, W] composited with background
    t_final: jnp.ndarray  # [H, W] final transmittance
    radii: jnp.ndarray  # [N] int32
    num_instances: jnp.ndarray  # [] int32
    overflow: jnp.ndarray  # [] bool


def _float0_like(x):
    return np.zeros(x.shape, jax.dtypes.float0)


def _gather_padded(fields_ext, binned: Binned, cfg: RasterConfig):
    """Instance gather, done ONCE per step (the [padded_rows]-row gather is
    as expensive as the whole blend kernel; forward and backward share it
    via the custom-VJP residuals). fields_ext arrives lane-compact
    [W, N+1] (pack_fields); Pallas gathers along lanes then reshapes into
    the DMA-aligned block layout; the JAX twin uses the flat row layout."""
    if cfg_backend(cfg) == "pallas":
        w = fields_ext.shape[0]
        # mode="clip": indices are in-bounds by construction (sentinel row
        # N); the default fill mode adds a full-size select pass
        padded_t = jnp.take(
            fields_ext, binned.padded_gauss, axis=1, mode="clip"
        )
        return padded_t.reshape(w, cfg.n_blocks, cfg.chunk).swapaxes(0, 1)
    return jnp.take(fields_ext.T, binned.padded_gauss, axis=0, mode="clip")


def _blend_impl(padded, binned: Binned, cfg: RasterConfig):
    if cfg_backend(cfg) == "pallas":
        from frosting_tpu.raster import blend_pallas

        return blend_pallas.blend_forward_pallas(padded, binned, cfg)
    return blend_jax.blend_forward_jax(padded, binned, cfg)


def _pack_bf16_pairs(cols):
    """Pack a list of equal-shape f32 arrays into ceil(len/2) uint32 arrays,
    each lane holding two bf16 values (hi = even index, lo = odd). Used to
    shrink payload-carrying sorts (cost ~0.2 ms per operand per million
    rows): 9 gradient rows -> 5 packed rows. Quantizes to bf16."""
    if len(cols) % 2:
        cols = list(cols) + [jnp.zeros_like(cols[0])]
    out = []
    for a, b in zip(cols[0::2], cols[1::2]):
        ua = jax.lax.bitcast_convert_type(
            a.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        ub = jax.lax.bitcast_convert_type(
            b.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        out.append((ua << 16) | ub)
    return out


def _unpack_bf16_pairs(packed, n_cols):
    """Inverse of _pack_bf16_pairs -> list of n_cols f32 arrays."""
    cols = []
    for p in packed:
        hi = (p >> 16).astype(jnp.uint16)
        lo = (p & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        cols.append(
            jax.lax.bitcast_convert_type(hi, jnp.bfloat16).astype(
                jnp.float32
            )
        )
        cols.append(
            jax.lax.bitcast_convert_type(lo, jnp.bfloat16).astype(
                jnp.float32
            )
        )
    return cols[:n_cols]


def _sorted_payload(key, cols, packed: bool):
    """lax.sort `cols` by `key`, optionally bf16-pair-packed (6 operands
    instead of 10 for 9 f32 payload rows). Returns sorted cols (f32)."""
    if not packed:
        ops = jax.lax.sort((key,) + tuple(cols), num_keys=1, is_stable=False)
        return list(ops[1:])
    pk = _pack_bf16_pairs(cols)
    ops = jax.lax.sort((key,) + tuple(pk), num_keys=1, is_stable=False)
    return _unpack_bf16_pairs(ops[1:], len(cols))


def _blend_bwd_impl(padded, binned: Binned, out, g_out, n_ext, cfg):
    # Per-gaussian reduction WITHOUT a scatter-add: segment_sum lowers to
    # an XLA scatter that costs more than the entire blend on TPU (~17 ms
    # at 1M rows), and indices_are_sorted changes nothing. Instead map
    # instance gradients back to ORIGINAL expansion order (each gaussian's
    # instances are contiguous there) and reduce the contiguous segments as
    # prefix-sum differences. The permutation is applied by SORTING the
    # gradient rows keyed by binning.orig_s (pre-sort instance index): a
    # 10-operand payload sort costs ~1.2 ms where the equivalent cap-sized
    # gather ran at scalar rate (~3.7 ms). On the pallas backend everything
    # stays in lane-compact (W, rows) layouts — a [rows, W] array is 8x
    # physically inflated by lane padding.
    b = binned.gauss_bounds  # [N+1]
    if cfg_backend(cfg) == "pallas":
        from frosting_tpu.raster import blend_pallas

        grads3 = blend_pallas.blend_backward_pallas(
            padded, binned, out, g_out, cfg
        )  # [n_blocks, 9, K]
        u = INSTANCE_FIELDS_USED
        grads_t = grads3.swapaxes(0, 1).reshape(u, cfg.padded_rows)
        sorted_cols = _sorted_payload(
            binned.orig_s,
            [grads_t[j] for j in range(u)],
            cfg.bwd_sort_bf16,
        )
        cap = cfg.max_instances
        grads_orig_t = jnp.stack(
            [row[:cap] for row in sorted_cols]
        )  # [9, cap]
        prefix_t = jnp.concatenate(
            [
                jnp.zeros((u, 1), grads_orig_t.dtype),
                jnp.cumsum(grads_orig_t, axis=1),
            ],
            axis=1,
        )
        # ONE boundary gather at all N+1 bounds then diff (two separate
        # b[1:] / b[:-1] gathers each pay the scalar-rate gather cost)
        pb = jnp.take(prefix_t, b, axis=1, mode="clip")  # [9, N+1]
        rows_s = pb[:, 1:] - pb[:, :-1]  # [9, N], DEPTH-SORTED gaussians
        # un-permute to original gaussian order — again a payload sort
        # (keyed on the original id each sorted position carries). NOTE:
        # this one stays f32 even under bwd_sort_bf16 — its rows are the
        # per-GAUSSIAN sums, where quantization would compound.
        unperm = jax.lax.sort(
            (binned.gauss_sorted,) + tuple(rows_s[j] for j in range(u)),
            num_keys=1,
            is_stable=False,
        )
        rows_t = jnp.stack(unperm[1:], axis=0)  # [9, N]
    else:
        grads_inst = blend_jax.blend_backward_jax(
            padded, binned, out, g_out, cfg
        )
        w = grads_inst.shape[1]
        sorted_cols = _sorted_payload(
            binned.orig_s,
            [grads_inst[:, j] for j in range(w)],
            cfg.bwd_sort_bf16,
        )
        grads_orig = jnp.stack(
            [row[: cfg.max_instances] for row in sorted_cols], axis=1
        )  # [cap, W]
        prefix = jnp.concatenate(
            [
                jnp.zeros((1, grads_orig.shape[1]), grads_orig.dtype),
                jnp.cumsum(grads_orig, axis=0),
            ]
        )
        pb = jnp.take(prefix, b, axis=0)  # [N+1, W]
        rows_s = pb[1:] - pb[:-1]  # [N, W], DEPTH-SORTED gaussians
        unperm = jax.lax.sort(
            (binned.gauss_sorted,)
            + tuple(rows_s[:, j] for j in range(rows_s.shape[1])),
            num_keys=1,
            is_stable=False,
        )
        rows_t = jnp.stack(unperm[1:], axis=0)  # [W, N]
    # sentinel column (the zero column appended by pack_fields) gets zero
    # grads; output matches fields_ext's lane-compact [W, N+1] layout
    return jnp.concatenate(
        [rows_t, jnp.zeros((rows_t.shape[0], n_ext - rows_t.shape[1]))],
        axis=1,
    )


def count_instances(
    means3d, scales, quats, opacities, sh, camera, cfg: RasterConfig
) -> int:
    """Instance count of one view (preprocess + bin only) — for capacity
    auto-tuning."""
    proj = preprocess(means3d, scales, quats, opacities, sh, camera, cfg)
    binned = bin_gaussians(proj.rect, proj.depths, proj.valid, cfg)
    return binned.num_instances


def autotune_max_instances(
    n_instances: int, chunk: int, safety: float = 1.7, minimum: int = 1 << 16
) -> int:
    """Pick max_instances from a measured per-view instance count. Every
    capacity-proportional cost (instance gather, layout, backward
    reduction, zero-init) scales with this static bound, so sizing it to
    the scene instead of a worst-case constant is a real speedup; the
    overflow flag still guards against under-sizing."""
    cap = max(minimum, int(n_instances * safety))
    return -(-cap // chunk) * chunk


def cfg_backend(cfg: RasterConfig) -> str:
    backend = getattr(cfg, "backend", "auto")
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "jax"
    return backend


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend(cfg: RasterConfig, fields_ext, rect, depths, valid):
    binned = bin_gaussians(rect, depths, valid, cfg)
    padded = _gather_padded(fields_ext, binned, cfg)
    out = _blend_impl(padded, binned, cfg)
    return out, binned.num_instances, binned.overflow


def _blend_fwd(cfg, fields_ext, rect, depths, valid):
    binned = bin_gaussians(rect, depths, valid, cfg)
    padded = _gather_padded(fields_ext, binned, cfg)
    out = _blend_impl(padded, binned, cfg)
    return (out, binned.num_instances, binned.overflow), (
        padded,
        binned,
        out,
        fields_ext.shape[1],
        rect,
        depths,
        valid,
    )


def _blend_bwd(cfg, res, cotangents):
    g_out, _g_n, _g_ovf = cotangents
    padded, binned, out, n_ext, rect, depths, valid = res
    dfields = _blend_bwd_impl(padded, binned, out, g_out, n_ext, cfg)
    return (
        dfields,
        _float0_like(rect),
        jnp.zeros_like(depths),
        _float0_like(valid),
    )


_blend.defvjp(_blend_fwd, _blend_bwd)


def _untile(out: jnp.ndarray, cfg: RasterConfig) -> jnp.ndarray:
    """[n_tiles+1, 4, P] -> [4, H, W]."""
    tiles = out[: cfg.n_tiles]
    t = tiles.reshape(cfg.tiles_y, cfg.tiles_x, 4, cfg.tile_h, cfg.tile_w)
    t = t.transpose(2, 0, 3, 1, 4).reshape(
        4, cfg.tiles_y * cfg.tile_h, cfg.tiles_x * cfg.tile_w
    )
    return t[:, : cfg.height, : cfg.width]


def render(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    sh: jnp.ndarray,
    camera: Camera,
    cfg: RasterConfig,
    bg: Optional[jnp.ndarray] = None,
    active_sh_degree: Optional[int] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    means2d_probe: Optional[jnp.ndarray] = None,
    pixel_offset=(0, 0),
) -> RenderOutput:
    """Differentiable Gaussian-splat render of one camera.

    `means2d_probe`: optional zeros [N, 2]; added to the projected 2D means so
    callers can read screen-space positional gradients for densification
    (the reference reads them off viewspace_points, sugar_densifier.py:156-164).
    """
    proj = preprocess(
        means3d,
        scales,
        quats,
        opacities,
        sh,
        camera,
        cfg,
        active_sh_degree=active_sh_degree,
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
        scale_modifier=scale_modifier,
        pixel_offset=pixel_offset,
    )
    if means2d_probe is not None:
        proj = proj._replace(means2d=proj.means2d + means2d_probe)
    return render_projected(proj, cfg, bg=bg)


def render_projected(
    proj: Projected, cfg: RasterConfig, bg: Optional[jnp.ndarray] = None
) -> RenderOutput:
    """Blend an already-projected Gaussian set (used by the sharded path,
    where preprocess is primitive-sharded and all-gathered)."""
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    fields_ext = pack_fields(proj)
    out, num_instances, overflow = _blend(
        cfg,
        fields_ext,
        jax.lax.stop_gradient(proj.rect),
        jax.lax.stop_gradient(proj.depths),
        jax.lax.stop_gradient(proj.valid),
    )
    img4 = _untile(out, cfg)
    t_final = img4[3]
    image = img4[:3] + t_final[None] * bg[:, None, None]
    return RenderOutput(
        image=image,
        t_final=t_final,
        radii=proj.radii,
        num_instances=num_instances,
        overflow=overflow,
    )
