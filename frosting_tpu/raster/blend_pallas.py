"""Pallas TPU kernels for the chunked alpha blend (forward + backward).

One grid program = ONE TILE (the renderCUDA thread-block analogue,
forward.cu:261-374). Each program walks its tile's chunk run with an
in-kernel while_loop: instance blocks are double-buffered from HBM by
manual async DMA, and per-pixel early termination becomes a chunk-level
loop exit that skips both the compute AND the remaining DMAs once every
pixel's transmittance is saturated.

This replaces the previous flat work-list grid (one grid step per chunk),
which paid the grid-step pipeline overhead for every chunk of the static
work capacity — including the ~60-75% dummy steps whenever
num_instances << max_instances — and could not skip the block fetch of
early-terminated chunks.

The compositing math is shared with the pure-JAX path (chunk_math.py).
Per-instance backward gradients go to disjoint (chunk, 16) row blocks of
the grads output (DMA'd over a pre-zeroed aliased buffer), replacing the
CUDA atomicAdd scatter (backward.cu:523-554) with a segment-sum outside.
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


def _tile_pixel_coords(t, cfg: RasterConfig):
    """(P, 1) pixel-center coordinate columns of tile `t` (traced scalar);
    P-major orientation matches chunk_math (pixels on sublanes)."""
    p = cfg.tile_pixels
    px0 = jax.lax.rem(t, cfg.tiles_x) * cfg.tile_w
    py0 = jax.lax.div(t, cfg.tiles_x) * cfg.tile_h
    sub = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (px0 + sub % cfg.tile_w).astype(jnp.float32)
    py = (py0 + sub // cfg.tile_w).astype(jnp.float32)
    return px, py


def _tile_pixel_basis_t(t, cfg: RasterConfig):
    """(basis_t (6, P), cx, cy) of tile `t` for the backward moment
    matmul; built once per program directly from lane iotas (no in-kernel
    relayout)."""
    p = cfg.tile_pixels
    px0 = jax.lax.rem(t, cfg.tiles_x) * cfg.tile_w
    py0 = jax.lax.div(t, cfg.tiles_x) * cfg.tile_h
    cx = px0.astype(jnp.float32) + 0.5 * (cfg.tile_w - 1)
    cy = py0.astype(jnp.float32) + 0.5 * (cfg.tile_h - 1)
    sub_r = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px_r = (px0 + sub_r % cfg.tile_w).astype(jnp.float32)
    py_r = (py0 + sub_r // cfg.tile_w).astype(jnp.float32)
    return chunk_math.tile_basis_t(px_r, py_r, cx, cy), cx, cy


def _forward_kernel(
    # scalar prefetch
    s_block0,  # [n_tiles] first block index
    s_nchunk,  # [n_tiles] chunk count
    # inputs
    inst_hbm,  # [n_blocks, 16, K] stays in HBM; manually DMA'd per block.
    #            Transposed layout: full (16, K) blocks are (8,128)-tile
    #            aligned, which Mosaic requires for manual DMA slices (a
    #            (K, 16)-row slice is not).
    # outputs
    out_ref,  # (TPP, 4, P) VMEM block of this program's tiles
    # scratch
    buf_ref,  # (2, SB, 16, K) double-buffered instance superblocks
    sem_ref,  # (2,) DMA semaphores
    *,
    cfg: RasterConfig,
):
    # One grid program handles cfg.tpp consecutive tiles: Pallas TPU grids
    # run sequentially on the TensorCore and each program entry costs ~5 us
    # of fixed overhead, which at fine tile grids (512+ programs) was a
    # measured ~2.5 ms floor. Each tile's chunk walk below is unchanged;
    # all DMA copies of a tile are drained before the next tile reuses the
    # scratch slots.
    with chunk_math.kernel_mode():
        for j in range(cfg.tpp):
            _forward_one_tile(
                pl.program_id(0) * cfg.tpp + j,
                j, s_block0, s_nchunk, inst_hbm, out_ref, buf_ref, sem_ref,
                cfg=cfg,
            )


def _forward_one_tile(
    t, j, s_block0, s_nchunk, inst_hbm, out_ref, buf_ref, sem_ref,
    *, cfg: RasterConfig
):
    block0 = s_block0[t]
    n = s_nchunk[t]
    p = cfg.tile_pixels
    sb = cfg.dma_superblock
    n_super = pl.cdiv(n, sb)
    px, py = _tile_pixel_coords(t, cfg)

    def dma(slot, s):
        # one copy fetches `sb` consecutive chunks; the buffer carries
        # trailing slack blocks, so the tail superblock over-reads harmlessly
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds(block0 + s * sb, sb)],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )

    dma(0, 0).start()

    def cond(c):
        s, t_all, t_mask, color = c
        # chunk-level early stop (renderCUDA per-pixel `done` break,
        # forward.cu:305-309): t_all is monotone, so once every pixel is
        # below the stop threshold later chunks cannot contribute
        return (s < n_super) & (
            jnp.max(t_all) >= chunk_math.TRANSMITTANCE_EPS
        )

    def body(c):
        s, t_all, t_mask, color = c
        slot = jax.lax.rem(s, 2)

        @pl.when(s + 1 < n_super)
        def _():
            dma(1 - slot, s + 1).start()

        dma(slot, s).wait()
        # Gate chunks only on the (scalar-compare) in-range test: per-pixel
        # saturation exactness is carried by the m/w masks in chunk_math,
        # and the early-stop test runs once per superblock in `cond`. A
        # per-chunk max(t_all) here would be a cross-sublane-to-scalar
        # reduction — measured to dominate the per-tile floor.
        for jj in range(sb):
            t_all, t_mask, color = jax.lax.cond(
                s * sb + jj < n,
                lambda ta, tm, co, jj=jj: chunk_math.forward_chunk(
                    buf_ref[slot, jj], ta, tm, co, px, py
                ),
                lambda ta, tm, co: (ta, tm, co),
                t_all, t_mask, color,
            )
        return s + 1, t_all, t_mask, color

    s, t_all, t_mask, color = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(0),
            jnp.ones((p, 1), jnp.float32),
            jnp.ones((p, 1), jnp.float32),
            jnp.zeros((p, 3), jnp.float32),
        ),
    )

    # drain the in-flight prefetch if the loop exited early
    @pl.when(s < n_super)
    def _():
        dma(jax.lax.rem(s, 2), s).wait()

    # one small transpose per TILE (the P-major math is transpose-free
    # per chunk)
    out_ref[j, 0:3] = color.T
    out_ref[j, 3:4] = t_mask.T


def to_block_layout(padded_fields: jnp.ndarray, cfg: RasterConfig):
    """[padded_rows, 16] -> [n_blocks, 16, K] (the DMA-aligned layout)."""
    return padded_fields.reshape(
        cfg.n_blocks, cfg.chunk, INSTANCE_WIDTH
    ).swapaxes(1, 2)


def blend_forward_pallas(
    padded3: jnp.ndarray,  # [n_blocks, 16, K] (to_block_layout output)
    binned: Binned,
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Returns out [n_tiles, 4, P]: rows 0..2 color, row 3 t_mask."""
    p = cfg.tile_pixels
    k = cfg.chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cfg.n_tiles // cfg.tpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (cfg.tpp, 4, p),
            lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, cfg.dma_superblock, INSTANCE_WIDTH, k), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_forward_kernel, cfg=cfg),
        out_shape=jax.ShapeDtypeStruct((cfg.n_tiles, 4, p), jnp.float32),
        grid_spec=grid_spec,
        interpret=cfg.pallas_interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        binned.tile_block0,
        binned.tile_nchunks,
        padded3,
    )


def _backward_kernel(
    # scalar prefetch
    s_block0,
    s_nchunk,
    # inputs
    inst_hbm,  # [n_blocks, 16, K] ANY
    zeros_hbm,  # [n_blocks, 16, K] ANY, aliased to grads output
    fwd_ref,  # (TPP, 4, P) forward outputs of this program's tiles
    g_ref,  # (TPP, 4, P) cotangents of this program's tiles
    # outputs
    grad_hbm,  # [n_blocks, 16, K] ANY (pre-zeroed via aliasing)
    # scratch
    buf_ref,  # (2, SB, 16, K) instance superblocks in
    gbuf_ref,  # (2, SB, 16, K) gradient rows out
    isem_ref,  # (2,) in-DMA semaphores
    osem_ref,  # (2,) out-DMA semaphores
    *,
    cfg: RasterConfig,
):
    # tpp consecutive tiles per program (see _forward_kernel); each tile's
    # in- and out-DMAs are fully drained before the next tile reuses the
    # scratch slots.
    with chunk_math.kernel_mode():
        for j in range(cfg.tpp):
            _backward_one_tile(
                pl.program_id(0) * cfg.tpp + j,
                j, s_block0, s_nchunk, inst_hbm, fwd_ref, g_ref, grad_hbm,
                buf_ref, gbuf_ref, isem_ref, osem_ref, cfg=cfg,
            )


def _backward_one_tile(
    t, j, s_block0, s_nchunk, inst_hbm, fwd_ref, g_ref, grad_hbm,
    buf_ref, gbuf_ref, isem_ref, osem_ref, *, cfg: RasterConfig
):
    block0 = s_block0[t]
    n = s_nchunk[t]
    p = cfg.tile_pixels
    sb = cfg.dma_superblock
    n_super = pl.cdiv(n, sb)
    px, py = _tile_pixel_coords(t, cfg)
    basis_t, cx, cy = _tile_pixel_basis_t(t, cfg)

    g_color = g_ref[j, 0:3].T  # (P, 3)
    g_tmask = g_ref[j, 3:4].T  # (P, 1)
    c_total = fwd_ref[j, 0:3].T
    t_final_mask = fwd_ref[j, 3:4].T
    gc_total = jnp.sum(g_color * c_total, axis=1, keepdims=True)

    def in_dma(slot, s):
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds(block0 + s * sb, sb)],
            buf_ref.at[slot],
            isem_ref.at[slot],
        )

    def out_dma(slot, s):
        # ONE copy per superblock (per-chunk 8 KB copies are DMA-latency
        # bound). The tail superblock writes its slack chunks too — zeros
        # into the next tile's leading blocks, which that tile's program
        # always overwrites later (its superblock 0 is unconditionally
        # processed and this program drains its copies before ending).
        return pltpu.make_async_copy(
            gbuf_ref.at[slot],
            grad_hbm.at[pl.ds(block0 + s * sb, sb)],
            osem_ref.at[slot],
        )

    in_dma(0, 0).start()

    def cond(c):
        s, t_all, gc_pre = c
        return (s < n_super) & (
            jnp.max(t_all) >= chunk_math.TRANSMITTANCE_EPS
        )

    def body(c):
        s, t_all, gc_pre = c
        slot = jax.lax.rem(s, 2)

        @pl.when(s + 1 < n_super)
        def _():
            in_dma(1 - slot, s + 1).start()

        in_dma(slot, s).wait()

        # the out-DMA that used this gbuf slot (superblock s-2) must land
        # before reuse
        @pl.when(s >= 2)
        def _():
            out_dma(slot, 0).wait()

        # Gate on the scalar in-range test only (see the forward kernel):
        # for saturated pixels the m-mask makes every gradient row exactly
        # zero, so no per-chunk max(t_all) scalar reduction is needed.
        for jj in range(sb):
            j = s * sb + jj
            in_range = j < n

            def real(ta, gp, jj=jj):
                return chunk_math.backward_chunk(
                    buf_ref[slot, jj], g_color, g_tmask, gc_total,
                    t_final_mask, ta, gp, px, py, basis_t, cx, cy,
                )

            def dead(ta, gp):
                return (
                    jnp.zeros((INSTANCE_WIDTH, cfg.chunk), jnp.float32),
                    ta,
                    gp,
                )

            grad_t, t_all, gc_pre = jax.lax.cond(
                in_range, real, dead, t_all, gc_pre
            )

            # every chunk of the superblock is written (zeros when dead or
            # out of range) so the single out-DMA carries no stale data
            gbuf_ref[slot, jj] = grad_t

        out_dma(slot, s).start()
        return s + 1, t_all, gc_pre

    s_exit, _t_all, _gc = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(0),
            jnp.ones((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
        ),
    )

    # drain: in-flight prefetch on early exit + out-DMAs of the last two
    # processed superblocks (one was started per executed body)
    @pl.when(s_exit < n_super)
    def _():
        in_dma(jax.lax.rem(s_exit, 2), s_exit).wait()

    for dq in (2, 1):
        @pl.when(s_exit >= dq)
        def _(dq=dq):
            out_dma(jax.lax.rem(s_exit - dq, 2), 0).wait()


def blend_backward_pallas(
    padded3: jnp.ndarray,  # [n_blocks, 16, K]
    binned: Binned,
    out_fwd: jnp.ndarray,  # [n_tiles, 4, P]
    g_out: jnp.ndarray,  # [n_tiles, 4, P]
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Returns per-instance gradients in BLOCK layout [n_blocks, 16, K]
    (lane-compact; a [padded_rows, 16] layout would be 8x physically
    inflated by lane padding). Chunks skipped by early termination are
    zero (they contributed nothing)."""
    p = cfg.tile_pixels
    k = cfg.chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cfg.n_tiles // cfg.tpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (cfg.tpp, 4, p),
                lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cfg.tpp, 4, p),
                lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(
                (2, cfg.dma_superblock, INSTANCE_WIDTH, k), jnp.float32
            ),
            pltpu.VMEM(
                (2, cfg.dma_superblock, INSTANCE_WIDTH, k), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    zeros = jnp.zeros((cfg.n_blocks, INSTANCE_WIDTH, k), jnp.float32)
    return pl.pallas_call(
        functools.partial(_backward_kernel, cfg=cfg),
        out_shape=jax.ShapeDtypeStruct(
            (cfg.n_blocks, INSTANCE_WIDTH, k), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=cfg.pallas_interpret,
        # alias the pre-zeroed buffer to the grads output so skipped chunks
        # read back as exact zero. Index 3 = zeros_hbm counting the 2
        # scalar-prefetch operands first.
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        binned.tile_block0,
        binned.tile_nchunks,
        padded3,
        zeros,
        out_fwd,
        g_out,
    )
