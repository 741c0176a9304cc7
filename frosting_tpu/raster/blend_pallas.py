"""Pallas TPU kernels for the chunked alpha blend (forward + backward).

One grid step = one (tile, chunk) work item from the flat work-list built by
binning.py. Chunks of the same tile are consecutive, so the carried
transmittance/color state lives in VMEM scratch across grid steps and the
output tile block stays resident until its last chunk writes it. The actual
compositing math is shared with the pure-JAX path (chunk_math.py) — the
kernel only adds the memory choreography. Per-instance backward gradients go
to disjoint (chunk, 16) rows of the grads output, replacing the CUDA
atomicAdd scatter (backward.cu:523-554) with a segment-sum outside.

Work-list metadata arrives as THREE bit-packed scalar-prefetch arrays
(binning.Binned docstring) to respect the ~1 MB SMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from frosting_tpu.raster import chunk_math
from frosting_tpu.raster.binning import Binned
from frosting_tpu.raster.config import INSTANCE_WIDTH, RasterConfig


def _pixel_coords(pxy, cfg: RasterConfig):
    p = cfg.tile_pixels
    px0 = Binned.pxy_px0(pxy)
    py0 = Binned.pxy_py0(pxy)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (px0 + lane % cfg.tile_w).astype(jnp.float32)
    py = (py0 + lane // cfg.tile_w).astype(jnp.float32)
    return px, py


def _forward_kernel(
    # scalar prefetch
    s_block,
    s_meta,
    s_pxy,
    # inputs
    inst_ref,  # (K, 16) VMEM
    # outputs
    out_ref,  # (1, 4, P) VMEM
    # scratch
    color_ref,  # (3, P)
    t_ref,  # (2, P): row 0 t_all, row 1 t_mask
    *,
    cfg: RasterConfig,
):
    w = pl.program_id(0)
    meta = s_meta[w]
    first = Binned.meta_first(meta)
    last = Binned.meta_last(meta)
    is_real = Binned.meta_out(meta) < cfg.n_tiles

    @pl.when(is_real)
    def _():
        @pl.when(first == 1)
        def _():
            color_ref[...] = jnp.zeros_like(color_ref)
            t_ref[...] = jnp.ones_like(t_ref)

        # Chunk-level early stop (the renderCUDA per-pixel `done` break,
        # forward.cu:305-309): once every pixel's running transmittance is
        # below the stop threshold, later chunks cannot contribute (the
        # inclusion test m uses the monotone t_all), so skip their compute.
        live = jnp.max(t_ref[0:1]) >= chunk_math.TRANSMITTANCE_EPS

        @pl.when((first == 1) | live)
        def _():
            px, py = _pixel_coords(s_pxy[w], cfg)
            t_all, t_mask, color = chunk_math.forward_chunk(
                inst_ref[...],
                t_ref[0:1],
                t_ref[1:2],
                color_ref[...],
                px,
                py,
            )
            color_ref[...] = color
            t_ref[0:1] = t_all
            t_ref[1:2] = t_mask

        @pl.when(last == 1)
        def _():
            out_ref[0, 0:3] = color_ref[...]
            out_ref[0, 3:4] = t_ref[1:2]


def blend_forward_pallas(
    padded_fields: jnp.ndarray,  # [padded_rows, 16]
    binned: Binned,
    cfg: RasterConfig,
) -> jnp.ndarray:
    p = cfg.tile_pixels
    k = cfg.chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cfg.work_cap,),
        in_specs=[
            pl.BlockSpec(
                (k, INSTANCE_WIDTH),
                lambda w, sb, *_: (sb[w], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, p),
            lambda w, sb, sm, *_: (sm[w] >> 2, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, p), jnp.float32),
            pltpu.VMEM((2, p), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_forward_kernel, cfg=cfg),
        out_shape=jax.ShapeDtypeStruct((cfg.n_tiles + 1, 4, p), jnp.float32),
        grid_spec=grid_spec,
        interpret=cfg.pallas_interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        binned.work_block,
        binned.work_meta,
        binned.work_pxy,
        padded_fields,
    )


def _backward_kernel(
    # scalar prefetch
    s_block,
    s_meta,
    s_pxy,
    # inputs
    inst_ref,  # (K, 16)
    fwd_ref,  # (1, 4, P) forward output of this tile
    g_ref,  # (1, 4, P) cotangent of this tile
    # outputs
    grad_ref,  # (K, 16)
    # scratch
    carry_ref,  # (2, P): row 0 t_all, row 1 gc_pre
    *,
    cfg: RasterConfig,
):
    w = pl.program_id(0)
    meta = s_meta[w]
    first = Binned.meta_first(meta)
    is_real = Binned.meta_out(meta) < cfg.n_tiles

    @pl.when(first == 1)
    def _():
        carry_ref[0:1] = jnp.ones_like(carry_ref[0:1])
        carry_ref[1:2] = jnp.zeros_like(carry_ref[1:2])

    live = is_real & (
        (first == 1)
        | (jnp.max(carry_ref[0:1]) >= chunk_math.TRANSMITTANCE_EPS)
    )

    @pl.when(live)
    def _():
        g_color = g_ref[0, 0:3]
        g_tmask = g_ref[0, 3:4]
        c_total = fwd_ref[0, 0:3]
        t_final_mask = fwd_ref[0, 3:4]
        gc_total = jnp.sum(g_color * c_total, axis=0, keepdims=True)

        px, py = _pixel_coords(s_pxy[w], cfg)
        grad_rows, t_all, gc_pre = chunk_math.backward_chunk(
            inst_ref[...],
            g_color,
            g_tmask,
            gc_total,
            t_final_mask,
            carry_ref[0:1],
            carry_ref[1:2],
            px,
            py,
        )
        carry_ref[0:1] = t_all
        carry_ref[1:2] = gc_pre
        grad_ref[...] = grad_rows

    @pl.when(jnp.logical_not(live))
    def _():
        # stopped/dummy chunks contribute exactly zero gradient; the block
        # is stored every grid step, so it must be written regardless
        grad_ref[...] = jnp.zeros_like(grad_ref)


def blend_backward_pallas(
    padded_fields: jnp.ndarray,
    binned: Binned,
    out_fwd: jnp.ndarray,  # [n_tiles+1, 4, P]
    g_out: jnp.ndarray,  # [n_tiles+1, 4, P]
    cfg: RasterConfig,
) -> jnp.ndarray:
    p = cfg.tile_pixels
    k = cfg.chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cfg.work_cap,),
        in_specs=[
            pl.BlockSpec(
                (k, INSTANCE_WIDTH),
                lambda w, sb, *_: (sb[w], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, p),
                lambda w, sb, sm, *_: (sm[w] >> 2, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, p),
                lambda w, sb, sm, *_: (sm[w] >> 2, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (k, INSTANCE_WIDTH),
            lambda w, sb, *_: (sb[w], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, p), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_backward_kernel, cfg=cfg),
        out_shape=jax.ShapeDtypeStruct(
            (cfg.padded_rows, INSTANCE_WIDTH), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=cfg.pallas_interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        binned.work_block,
        binned.work_meta,
        binned.work_pxy,
        padded_fields,
        out_fwd,
        g_out,
    )
