"""Tile binning: bounded instance expansion, depth sort, K-aligned layout.

TPU-native replacement for the CUDA duplication + cub radix sort + range
identification (rasterizer_impl.cu:70-138, 280-317). All shapes static:

  * instance expansion uses telescoping diff-scatter + cumsum run-length
    decodes (bit-packed channels) instead of per-thread scatter,
  * the 64-bit [tile|depth] radix sort becomes one stable `lax.sort` on
    the tile id alone: the instance stream is emitted in depth-major
    order (the per-gaussian table is pre-sorted by depth), so stability
    supplies the per-tile depth order,
  * the per-tile ranges are laid out chunk-aligned IN THE SORT ITSELF:
    per-tile padding instances are synthesized BEFORE the sort (tile
    counts come from a vector-rate 2D difference histogram of the rects),
    with sort keys placing them at each tile's run end — so the sorted
    order IS the padded layout and no cap-sized destination scatter is
    needed. Permutations are applied/inverted by payload-carrying sorts
    rather than gathers or scatters: on this TPU runtime cap-sized
    scatters AND gathers run at scalar rate (~7-9 ns/row) while sorts run
    at vector/memory rate (~0.2 ms per operand per million rows).

Everything here is integer bookkeeping — no gradients flow through it.

Overflow semantics: when num_instances > max_instances the overflow flag is
set and the rendered output is garbage-but-bounded (the pre-sort layout
no longer matches the truncated instance stream); callers must re-run with
a larger capacity, exactly as with the reference's dynamic resize.
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
    # gradient sum is a permutation back to that order + a sorted-segment
    # reduction. The permutation is applied by SORTING the gradient rows
    # with orig_s as the key (payload-carrying sorts run ~3x faster than
    # the equivalent cap-sized gather on this runtime).
    orig_s: jnp.ndarray  # [padded_rows] pre-sort (depth-major expansion)
    #                      instance index of each padded row (>=
    #                      max_instances for padding rows)
    gauss_sorted: jnp.ndarray  # [N] ORIGINAL gaussian id at each position
    #                            of the depth-sorted gaussian table
    gauss_bounds: jnp.ndarray  # [N+1] segment bounds per DEPTH-SORTED
    #                            gaussian in the depth-major expansion
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


def _tile_counts_2d(rect, valid, cfg: RasterConfig) -> jnp.ndarray:
    """Per-tile instance counts WITHOUT scalar scatters: each rect
    contributes +-1 corner marks on the (tiles_y+1, tiles_x+1) grid, and a
    2D prefix sum turns corner marks into box coverage counts.

    The corner histogram is a MATMUL: split the flat corner index into
    hi/lo parts, build signed one-hot factors, and contract the point axis
    on the MXU — onehot_hi^T (H, 4N) @ onehot_lo (4N, L) = (H, L) joint
    counts. Vector/MXU rate at any grid size (a naive one-hot reduce is
    O(N * G) elementwise; a scatter-add histogram runs at scalar rate).
    f32 accumulation is exact for counts < 2^24."""
    i32 = jnp.int32
    gx = cfg.tiles_x + 1
    gy = cfg.tiles_y + 1
    g_total = gy * gx
    lo_sz = 128
    hi_sz = -(-g_total // lo_sz)
    tx0, ty0, tx1, ty1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    # corner marks: +1 @ (y0,x0), -1 @ (y0,x1), -1 @ (y1,x0), +1 @ (y1,x1)
    cidx = jnp.concatenate(
        [
            ty0 * gx + tx0,
            ty0 * gx + tx1,
            ty1 * gx + tx0,
            ty1 * gx + tx1,
        ],
        axis=0,
    )  # [4N]
    n = tx0.shape[0]
    sign = jnp.repeat(jnp.asarray([1.0, -1.0, -1.0, 1.0], jnp.float32), n)
    sign = sign * jnp.tile(valid.astype(jnp.float32), 4)
    hi = cidx // lo_sz
    lo = cidx - hi * lo_sz

    # Block over the point axis: the full one-hot factors would be
    # [H, 4N] and [4N, L] (a 4M-gaussian scene at a 1080p/16px grid is
    # ~2 GB of materialized one-hots); per-block factors stay ~MBs and
    # the (H, L) partial sums accumulate exactly in f32.
    blk = 1 << 17
    m = cidx.shape[0]
    pad = (-m) % blk
    cidx_hi = jnp.concatenate([hi, jnp.zeros((pad,), hi.dtype)])
    cidx_lo = jnp.concatenate([lo, jnp.zeros((pad,), lo.dtype)])
    sign_p = jnp.concatenate([sign, jnp.zeros((pad,), sign.dtype)])
    hi_iota = jnp.arange(hi_sz, dtype=i32)[:, None]
    lo_iota = jnp.arange(lo_sz, dtype=i32)[None, :]

    def block_hist(carry, xs):
        h, l, s = xs
        oh_hi = (h[None, :] == hi_iota).astype(jnp.float32) * s[None, :]
        oh_lo = (l[:, None] == lo_iota).astype(jnp.float32)
        # DEFAULT precision is EXACT here: the factors are 0/+-1 (exactly
        # representable in bf16) and the MXU accumulates in f32.
        return carry + jax.lax.dot_general(
            oh_hi,
            oh_lo,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), None

    # Unroll the block loop when it is short (the common case: <= 8
    # blocks): a lax.scan of 4 blocks paid ~1 ms of while-loop overhead
    # per step, half the histogram's cost. Scenes large enough to exceed
    # the unroll cap fall back to a scan whose overhead is amortized by
    # the real per-block work.
    n_blocks = (m + pad) // blk
    xs = (
        cidx_hi.reshape(-1, blk),
        cidx_lo.reshape(-1, blk),
        sign_p.reshape(-1, blk),
    )
    if n_blocks <= 8:
        marks = jnp.zeros((hi_sz, lo_sz), jnp.float32)
        for bi in range(n_blocks):
            marks, _ = block_hist(
                marks, (xs[0][bi], xs[1][bi], xs[2][bi])
            )
    else:
        # inherit the device-varying type of the data (no-op numerically)
        # so the scan carry is consistent under shard_map's
        # varying-manual-axes check (same pattern as blend_jax)
        taint = jnp.where(jnp.bool_(False), sign[0], jnp.float32(0))
        marks, _ = jax.lax.scan(
            block_hist,
            jnp.zeros((hi_sz, lo_sz), jnp.float32) + taint,
            xs,
        )
    marks = marks.reshape(-1)[:g_total]
    grid = jnp.round(marks).astype(i32).reshape(gy, gx)
    grid = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)
    return grid[: cfg.tiles_y, : cfg.tiles_x].reshape(-1)


def _empty_binned(cfg: RasterConfig) -> Binned:
    """Binned result for an N=0 scene: one padding chunk per tile (every
    tile's output block is still written), zero real work rows."""
    i32 = jnp.int32
    k = cfg.chunk
    nt = cfg.n_tiles
    tile_ids = jnp.arange(nt, dtype=i32)
    padded_gauss = jnp.zeros((cfg.padded_rows,), i32)  # gaussian N==0 rows
    # ... but the sentinel id must be n (=0): every row already is 0, and
    # with n==0 the gather tables are empty, so the blend's fields gather
    # uses mode="clip" on the zero sentinel row appended by pack_fields
    work_block = jnp.where(
        jnp.arange(cfg.work_cap, dtype=i32) < nt,
        jnp.minimum(jnp.arange(cfg.work_cap, dtype=i32), nt - 1),
        cfg.n_blocks - 1,
    ).astype(i32)
    is_real = jnp.arange(cfg.work_cap, dtype=i32) < nt
    work_out = jnp.where(is_real, jnp.arange(cfg.work_cap, dtype=i32), nt)
    px0 = (tile_ids % cfg.tiles_x * cfg.tile_w).astype(i32)
    py0 = (tile_ids // cfg.tiles_x * cfg.tile_h).astype(i32)
    pxy = jnp.zeros((cfg.work_cap,), i32).at[:nt].set((px0 << 16) | py0)
    return Binned(
        padded_gauss=padded_gauss,
        work_block=work_block,
        work_meta=(work_out * 4 + is_real * 2 + is_real).astype(i32),
        work_pxy=pxy,
        tile_block0=tile_ids,
        tile_nchunks=jnp.ones((nt,), i32),
        orig_s=jnp.arange(cfg.padded_rows, dtype=i32),
        gauss_sorted=jnp.zeros((0,), i32),
        gauss_bounds=jnp.zeros((1,), i32),
        n_work=jnp.asarray(nt, i32),
        num_instances=jnp.zeros((), i32),
        overflow=jnp.zeros((), jnp.bool_),
    )


def bin_gaussians(
    rect: jnp.ndarray,  # [N, 4] int32 tile bbox
    depths: jnp.ndarray,  # [N] f32
    valid: jnp.ndarray,  # [N] bool
    cfg: RasterConfig,
) -> Binned:
    n = rect.shape[0]
    cap = cfg.max_instances
    i32 = jnp.int32

    if n == 0:
        # degenerate scene (everything culled/pruned upstream): every tile
        # gets one all-pad chunk, the kernels blend nothing
        return _empty_binned(cfg)

    tx0, ty0, tx1, ty1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    w = tx1 - tx0
    counts = jnp.where(valid, w * (ty1 - ty0), 0).astype(i32)
    base = ty0 * cfg.tiles_x + tx0
    gauss_ids = jnp.arange(n, dtype=i32)

    # --- depth-major gaussian table: ONE stable payload sort (invalid
    # gaussians key to +inf and sort last with zero counts). Because the
    # instance stream below is emitted in THIS order, per-tile depth order
    # comes from the main sort's STABILITY alone: the per-instance
    # depth-rank decode channel and the main sort's second key both
    # disappear (the previous design argsorted depths, inverted the
    # permutation with a second sort, and decoded a rank per instance).
    dkey = jnp.where(valid, depths, jnp.inf)
    _dk, gauss_sorted, w_s, counts_s, base_s = jax.lax.sort(
        (dkey, gauss_ids, w.astype(i32), counts, base.astype(i32)),
        num_keys=1,
        is_stable=True,
    )

    # --- instance expansion (duplicateWithKeys, rasterizer_impl.cu:70-96) ---
    # Run-length decode via scatter + cumsum instead of per-instance
    # searchsorted/gather: XLA-TPU random gathers run at scalar rate, so the
    # naive decode (17M+ gathered elements for 1M instances) costs ~180 ms;
    # this formulation is a handful of 100k-element scatters plus cap-sized
    # cumsums (~ms) and is EXACT (integer arithmetic only). When the
    # instance count exceeds the capacity the FARTHEST instances are the
    # ones truncated (depth-major stream) and the overflow flag is set.
    cum = jnp.cumsum(counts_s)  # inclusive
    offs = cum - counts_s  # exclusive
    total = cum[-1] if n > 0 else jnp.zeros((), i32)
    overflow = total > cap
    inst = jnp.arange(cap, dtype=i32)
    inst_valid = inst < total

    if cfg.decode == "gather":
        # --- searchsorted + ONE lane gather. inst -> owning depth-rank via
        # a capacity-bounded binary search over the inclusive cumulative
        # counts (log2(N) passes, ~0.05 ms at 1M cap), then every
        # per-gaussian channel comes from a single [4, N] LANE-layout
        # gather (~1 ns/index at <=8 sublane rows — the row gathers that
        # justified the round-3 scatter design ran ~7 ns/row; lane
        # gathers were only introduced with the round-3 field packing and
        # never re-measured for the decode until round 4).
        seg = jnp.searchsorted(cum, inst, side="right").astype(i32)
        table = jnp.stack(
            [gauss_sorted, offs, jnp.maximum(w_s, 1), base_s]
        )  # [4, N]
        dec = jnp.take(table, jnp.minimum(seg, n - 1), axis=1, mode="clip")
        gauss_c, i_off, i_w, i_base = dec[0], dec[1], dec[2], dec[3]
    else:
        # --- packed diff-scatter decode channels (round-3 design, kept
        # for A/B). Static bit budgets decide the packing; every field is
        # nonnegative and bounded, so packed channels stay below 2^31.
        bits_cap = max(int(cap).bit_length(), 1)
        bits_n = max(int(n).bit_length(), 1)
        bits_t = max(int(cfg.n_tiles).bit_length(), 1)
        bits_w = max(int(cfg.tiles_x).bit_length(), 1)  # width <= tiles_x

        # EVERY per-instance channel is its own diff-scatter run-length
        # decode (telescoping diffs at run starts; bit-packing multiple
        # fields into one channel is exact because the decode is linear:
        # every PARTIAL SUM of the delta stream is an actual packed
        # value). The scatters share one batched [S, cap] cumsum along
        # axis 1 (a 1-D cap-sized cumsum costs ~0.9 ms alone; the 2-D
        # batched form amortizes across channels).
        streams = []
        pack_gw = bits_n + bits_w <= 31  # gauss_orig | w
        pack_ob = bits_cap + bits_t <= 31  # offs | base
        streams.append(
            gauss_sorted * (1 << bits_w) + w_s if pack_gw else gauss_sorted
        )
        if not pack_gw:
            streams.append(w_s)
        streams.append(offs * (1 << bits_t) + base_s if pack_ob else offs)
        if not pack_ob:
            streams.append(base_s)
        # one 1-D scatter per channel (a batched [S, cap] scatter measured
        # 14.6 ns/value vs 8.7 for separate 1-D scatters — TPU scatters
        # cost per-value and the 2-D form adds index-arithmetic overhead).
        delta = jnp.stack(
            [
                jnp.zeros((cap,), i32)
                .at[0]
                .add(v[0])
                .at[offs[1:]]
                .add(jnp.diff(v), mode="drop")
                for v in streams
            ]
        )
        dec = jnp.cumsum(delta, axis=1)  # [S, cap]
        s = 0
        if pack_gw:
            gauss_c = dec[s] >> bits_w
            i_w = jnp.maximum(dec[s] & ((1 << bits_w) - 1), 1)
            s += 1
        else:
            gauss_c = dec[s]
            i_w = jnp.maximum(dec[s + 1], 1)
            s += 2
        if pack_ob:
            i_off = dec[s] >> bits_t
            i_base = dec[s] & ((1 << bits_t) - 1)
        else:
            i_off = dec[s]
            i_base = dec[s + 1]

    i_rank = inst - i_off
    # small-int div via f32 (exact for values < 2^24)
    rr = i_rank.astype(jnp.float32)
    ww = i_w.astype(jnp.float32)
    ry = jnp.floor(rr / ww)
    rx = (rr - ry * ww).astype(i32)
    tile_id = jnp.where(
        inst_valid, i_base + ry.astype(i32) * cfg.tiles_x + rx, cfg.n_tiles
    ).astype(i32)
    inst_gauss = jnp.where(inst_valid, gauss_c, n).astype(i32)

    # --- per-tile padded layout, computed BEFORE the sort from the
    # histogram counts; every tile gets >= 1 chunk ---
    k = cfg.chunk
    tile_counts = _tile_counts_2d(rect, valid, cfg)
    n_chunks = jnp.maximum(1, -(-tile_counts // k))
    padded_counts = n_chunks * k
    padded_off = jnp.concatenate(
        [jnp.zeros((1,), i32), jnp.cumsum(padded_counts)[:-1].astype(i32)]
    )

    # --- synthesize the padding instances (tile keyed, rank = n so they
    # sort to each tile's run end). pad_cap = padded_rows - cap is a
    # static bound >= the worst-case total padding (<= n_tiles * chunk,
    # config.padded_rows guarantees (n_tiles + 1) * chunk of slack). The
    # per-slot owning tile is a 256-entry scatter + cummax, not a
    # cap-sized op.
    pad_cap = cfg.padded_rows - cap
    pad_counts = padded_counts - tile_counts
    pad_offs = jnp.concatenate(
        [jnp.zeros((1,), i32), jnp.cumsum(pad_counts)[:-1].astype(i32)]
    )
    pad_total = (
        pad_offs[-1] + pad_counts[-1]
        if cfg.n_tiles > 0
        else jnp.zeros((), i32)
    )
    pad_iota = jnp.arange(pad_cap, dtype=i32)
    # ties (zero-pad tiles share an offset): .max picks the largest tile
    # index, which is the actual owner of the slot run
    pad_stream = (
        jnp.zeros((pad_cap,), i32)
        .at[pad_offs]
        .max(jnp.arange(cfg.n_tiles, dtype=i32), mode="drop")
    )
    pad_tile = jnp.where(
        pad_iota < pad_total, jax.lax.cummax(pad_stream), cfg.n_tiles
    ).astype(i32)

    # --- ONE stable sort on the tile key alone over real + pad
    # instances: the output order IS the chunk-aligned padded layout. The
    # instance stream is depth-major, so STABILITY gives per-tile
    # front-to-back depth order (ties keep depth-sort order, which keeps
    # gaussian submission order — same total order as the CUDA stable
    # radix sort on [tile|depth]); pads are concatenated after the real
    # stream so they close each tile's run. `orig_s` carries the pre-sort
    # instance index (pads get >= cap) so the backward can sort gradient
    # rows back into depth-major expansion order. ---
    sentinel_i32 = jnp.full((pad_cap,), n, i32)
    tile_all = jnp.concatenate([tile_id, pad_tile])
    gauss_all = jnp.concatenate([inst_gauss, sentinel_i32])
    orig_all = jnp.arange(cfg.padded_rows, dtype=i32)
    _tile_s, gauss_s, orig_s = jax.lax.sort(
        (tile_all, gauss_all, orig_all), num_keys=1, is_stable=True
    )
    padded_gauss = gauss_s  # [padded_rows]; sentinel rows carry n


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
        orig_s=orig_s,
        gauss_sorted=gauss_sorted,
        gauss_bounds=jnp.concatenate(
            [jnp.zeros((1,), i32), jnp.minimum(cum, cap).astype(i32)]
        ),
        n_work=n_work,
        num_instances=total,
        overflow=overflow,
    )
