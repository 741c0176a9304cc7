"""Tile binning: bounded instance expansion, depth sort, K-aligned layout.

TPU-native replacement for the CUDA duplication + cub radix sort + range
identification (rasterizer_impl.cu:70-138, 280-317). All shapes static:

  * instance expansion uses searchsorted over cumulative per-Gaussian tile
    counts instead of per-thread scatter,
  * the 64-bit [tile|depth] radix sort becomes one stable lexicographic
    `lax.sort` on (tile_id, depth),
  * the per-tile ranges are laid out chunk-aligned: every tile's instance run
    starts at a multiple of `chunk`, so the Pallas blend kernel only ever
    DMAs aligned (chunk, INSTANCE_WIDTH) blocks selected by a flat work-list.

Everything here is integer bookkeeping — no gradients flow through it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from frosting_tpu.raster.config import RasterConfig


class Binned(NamedTuple):
    """Static-shape binning result (all int32 unless noted).

    The per-work-item metadata is bit-packed into THREE arrays because the
    Pallas kernels prefetch them into SMEM (~1 MB total): six separate
    arrays overflow SMEM for fine tile grids / large instance caps.
      work_meta = out_row * 4 + first * 2 + last   (out_row == n_tiles -> trash)
      work_pxy  = px0 << 16 | py0
    """

    padded_gauss: jnp.ndarray  # [padded_rows] gaussian index; N = sentinel
    work_block: jnp.ndarray  # [work_cap] block index into padded instances
    work_meta: jnp.ndarray  # [work_cap] packed (out_row, first, last)
    work_pxy: jnp.ndarray  # [work_cap] packed (px0, py0)
    tile_block0: jnp.ndarray  # [n_tiles] first block index of each tile
    tile_nchunks: jnp.ndarray  # [n_tiles] chunk count of each tile (>= 1)
    # Backward-reduction helpers (replace jax.ops.segment_sum's scatter-add,
    # which costs more than the whole blend on TPU): in ORIGINAL expansion
    # order each gaussian's instances are contiguous, so the per-gaussian
    # gradient sum is a gather + a sorted-segment reduction.
    inv_map: jnp.ndarray  # [max_instances] padded row of orig instance i
    gauss_orig: jnp.ndarray  # [max_instances] gaussian id of orig instance i
    #                          (= N sentinel for i >= num_instances)
    gauss_bounds: jnp.ndarray  # [N+1] orig-order segment bounds per gaussian
    n_work: jnp.ndarray  # [] number of real work items
    num_instances: jnp.ndarray  # [] pre-clamp instance count
    overflow: jnp.ndarray  # [] bool, true if max_instances exceeded

    # unpacking helpers (usable on arrays or scalars, in or out of kernels)
    @staticmethod
    def meta_out(meta):
        return meta >> 2

    @staticmethod
    def meta_first(meta):
        return (meta >> 1) & 1

    @staticmethod
    def meta_last(meta):
        return meta & 1

    @staticmethod
    def pxy_px0(pxy):
        return pxy >> 16

    @staticmethod
    def pxy_py0(pxy):
        return pxy & 0xFFFF


def bin_gaussians(
    rect: jnp.ndarray,  # [N, 4] int32 tile bbox
    depths: jnp.ndarray,  # [N] f32
    valid: jnp.ndarray,  # [N] bool
    cfg: RasterConfig,
) -> Binned:
    n = rect.shape[0]
    cap = cfg.max_instances
    i32 = jnp.int32

    tx0, ty0, tx1, ty1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    w = tx1 - tx0
    counts = jnp.where(valid, w * (ty1 - ty0), 0).astype(i32)

    # --- instance expansion (duplicateWithKeys, rasterizer_impl.cu:70-96) ---
    # Run-length decode via scatter + cumsum instead of per-instance
    # searchsorted/gather: XLA-TPU random gathers run at scalar rate, so the
    # naive decode (17M+ gathered elements for 1M instances) costs ~180 ms;
    # this formulation is a handful of 100k-element scatters plus 1M-element
    # cumsums (~ms) and is EXACT (integer arithmetic only).
    cum = jnp.cumsum(counts)  # inclusive
    offs = cum - counts  # exclusive
    total = cum[-1] if n > 0 else jnp.zeros((), i32)
    overflow = total > cap
    inst = jnp.arange(cap, dtype=i32)
    inst_valid = inst < total

    # gauss[i] = #{g : cum[g] <= i}  (== searchsorted right)
    mark = jnp.zeros((cap,), i32).at[cum].add(1, mode="drop")
    gauss_c = jnp.minimum(jnp.cumsum(mark), n - 1)

    def decode(vals):
        """Per-instance step function vals[gauss[i]] without gathers:
        telescoping diff-scatter at run starts, then cumsum."""
        delta = (
            jnp.zeros((cap,), i32)
            .at[0]
            .add(vals[0])
            .at[offs[1:]]
            .add(jnp.diff(vals), mode="drop")
        )
        return jnp.cumsum(delta)

    # depth ORDER as integer ranks (exact; same ordering as float depths
    # with stable tie-break by gaussian index)
    depth_order = jnp.argsort(
        jnp.where(valid, depths, jnp.inf), stable=True
    ).astype(i32)
    depth_rank = (
        jnp.zeros((n,), i32).at[depth_order].set(jnp.arange(n, dtype=i32))
    )

    # Three decode channels instead of five: the tile-rect fields are
    # bit-packed into one channel (base = ty0*tiles_x + tx0 in the high
    # bits, w in the low 9). Packing is exact under the telescoping-diff
    # cumsum because it is linear: per-field deltas may borrow across bit
    # boundaries in an individual diff, but every PARTIAL SUM of the delta
    # stream is an actual packed value. Each decode is a cap-sized
    # scatter + cumsum, the dominant binning cost class on this runtime.
    if cfg.n_tiles > (1 << 16) or cfg.tiles_x > 511:
        raise ValueError("tile grid too large for packed binning decode")
    base = ty0 * cfg.tiles_x + tx0
    i_off = decode(offs)
    i_bw = decode(base * 512 + w)
    i_base = i_bw >> 9
    i_w = jnp.maximum(i_bw & 511, 1)
    i_rank = inst - i_off
    # small-int div via f32 (exact for values < 2^24)
    rr = i_rank.astype(jnp.float32)
    ww = i_w.astype(jnp.float32)
    ry = jnp.floor(rr / ww)
    rx = (rr - ry * ww).astype(i32)
    tile_id = jnp.where(
        inst_valid, i_base + ry.astype(i32) * cfg.tiles_x + rx, cfg.n_tiles
    ).astype(i32)
    inst_rank = jnp.where(inst_valid, decode(depth_rank), n).astype(i32)
    inst_gauss = jnp.where(inst_valid, gauss_c, n).astype(i32)

    # --- stable lexicographic sort on (tile, depth-rank); ties keep
    # gaussian (=submission) order like the CUDA stable radix sort.
    # `orig_s` carries the pre-sort instance index so the backward can map
    # padded rows back to the contiguous-per-gaussian original order ---
    tile_s, _rank_s, gauss_s, orig_s = jax.lax.sort(
        (tile_id, inst_rank, inst_gauss, inst), num_keys=2, is_stable=True
    )

    # --- per-tile ranges (identifyTileRanges, rasterizer_impl.cu:116-138) ---
    tiles = jnp.arange(cfg.n_tiles, dtype=i32)
    start = jnp.searchsorted(tile_s, tiles, side="left").astype(i32)
    end = jnp.searchsorted(tile_s, tiles, side="right").astype(i32)
    tile_counts = end - start

    # --- K-aligned padded layout; every tile gets >= 1 chunk ---
    k = cfg.chunk
    n_chunks = jnp.maximum(1, -(-tile_counts // k))
    padded_counts = n_chunks * k
    padded_off = jnp.concatenate(
        [jnp.zeros((1,), i32), jnp.cumsum(padded_counts)[:-1].astype(i32)]
    )
    # destination row of sorted instance i = i + pad_before[tile(i)], where
    # pad_before = padded_off - start is the cumulative chunk padding
    # inserted before the tile. Instead of a per-instance small-table
    # gather (measured as one of the most expensive index ops on this
    # runtime), scatter pad_before at each tile's start position and
    # propagate with a cummax: pad_before is monotone nondecreasing and
    # tile runs are consecutive, and when several tiles share a start
    # (empty tiles) the .max picks the owning (highest-index) tile.
    pad_before = padded_off - start
    in_range = tile_s < cfg.n_tiles
    pad_stream = (
        jnp.zeros((cap,), i32).at[start].max(pad_before, mode="drop")
    )
    dest = jnp.arange(cap, dtype=i32) + jax.lax.cummax(pad_stream)
    dest = jnp.where(in_range, dest, cfg.padded_rows - 1)
    padded_gauss = jnp.full((cfg.padded_rows,), n, i32).at[dest].set(
        jnp.where(in_range, gauss_s, n)
    )
    # the trailing dummy block must stay sentinel even after clamped scatters
    padded_gauss = padded_gauss.at[cfg.padded_rows - 1].set(n)

    # orig instance -> padded row (invalid instances land on the final
    # dummy row, whose gradient is always zero)
    inv_map = (
        jnp.full((cap,), cfg.padded_rows - 1, i32)
        .at[orig_s]
        .set(dest, mode="drop")
    )

    # --- flat chunk work-list ---
    chunk_cum = jnp.cumsum(n_chunks)  # inclusive
    n_work = chunk_cum[-1]
    wids = jnp.arange(cfg.work_cap, dtype=i32)
    wtile = jnp.searchsorted(chunk_cum, wids, side="right").astype(i32)
    is_real = wids < n_work
    wtile_c = jnp.minimum(wtile, cfg.n_tiles - 1)
    chunk_in_tile = wids - (chunk_cum[wtile_c] - n_chunks[wtile_c])
    work_block = jnp.where(
        is_real, padded_off[wtile_c] // k + chunk_in_tile, cfg.n_blocks - 1
    ).astype(i32)
    work_out = jnp.where(is_real, wtile_c, cfg.n_tiles).astype(i32)
    work_first = (is_real & (chunk_in_tile == 0)).astype(i32)
    work_last = (is_real & (chunk_in_tile == n_chunks[wtile_c] - 1)).astype(i32)
    work_px0 = (wtile_c % cfg.tiles_x * cfg.tile_w).astype(i32)
    work_py0 = (wtile_c // cfg.tiles_x * cfg.tile_h).astype(i32)

    return Binned(
        padded_gauss=padded_gauss,
        work_block=work_block,
        work_meta=(work_out * 4 + work_first * 2 + work_last).astype(i32),
        work_pxy=((work_px0 << 16) | work_py0).astype(i32),
        tile_block0=(padded_off // k).astype(i32),
        tile_nchunks=n_chunks.astype(i32),
        inv_map=inv_map,
        gauss_orig=inst_gauss,
        gauss_bounds=jnp.concatenate(
            [jnp.zeros((1,), i32), jnp.minimum(cum, cap).astype(i32)]
        ),
        n_work=n_work,
        num_instances=total,
        overflow=overflow,
    )
