"""Device-side approximate K-nearest-neighbors via Morton-sorted windows.

TPU-native replacement for both simple-knn's distCUDA2 (Morton-sorted
spatial boxes, simple_knn.cu:186-222) and PyTorch3D's knn_points as used by
the SuGaR/Frosting models (KNN-16 tracking, sugar_model.py:1044-1061;
neighbor queries at frosting_model.py:300, 2072). Strategy: sort points
along a Morton curve, take a +/-window of candidates in sorted order, exact
top-k over the candidate set. Multiple rotated grids raise recall; the
consumer (a density field summing exp(-mahalanobis)) is robust to the
residual approximation, like the reference's box-pruned approximate KNN.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _grid_rotation(g: int) -> np.ndarray:
    """Fixed rotation matrix of grid `g` (identity for g=0). Rotating the
    cloud before Morton quantization decorrelates the space-filling curves
    between grids far more than origin jitter: a pair of neighbors split
    across a cell boundary in one curve is almost never split in a rotated
    one (measured self-KNN recall @2M: 0.70 with 2 jittered grids ->
    ~0.9 with 2 rotated grids at the same window)."""
    if g == 0:
        return np.eye(3, dtype=np.float32)
    rng = np.random.default_rng(1234 + g)
    # QR of a Gaussian matrix = uniformly random rotation (deterministic
    # per grid index)
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    return q.astype(np.float32)


def _rotate(points: jnp.ndarray, rot: np.ndarray) -> jnp.ndarray:
    """[N, 3] @ R as unrolled elementwise madds (skinny [N,3]x[3,3]
    matmuls lose precision by default on the MXU; see ops/cov.py)."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    cols = [
        x * float(rot[0, c]) + y * float(rot[1, c]) + z * float(rot[2, c])
        for c in range(3)
    ]
    return jnp.stack(cols, axis=1)


def _spread_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits of x to every 3rd bit (Morton interleave helper)."""
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & jnp.uint32(0x30000FF)
    x = (x | (x << 8)) & jnp.uint32(0x300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x9249249)
    return x


def morton_codes(points: jnp.ndarray, lo=None, hi=None) -> jnp.ndarray:
    """[N, 3] -> uint32 Morton codes on a 1024^3 grid over the bbox."""
    if lo is None:
        lo = jnp.min(points, axis=0)
    if hi is None:
        hi = jnp.max(points, axis=0)
    q = (points - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((q * 1023.0), 0.0, 1023.0).astype(jnp.uint32)
    return (
        _spread_bits(q[:, 0])
        | (_spread_bits(q[:, 1]) << 1)
        | (_spread_bits(q[:, 2]) << 2)
    )


@functools.partial(
    jax.jit, static_argnames=("k", "window", "n_grids", "refine_rounds")
)
def knn(
    points: jnp.ndarray,  # [N, 3]
    k: int = 16,
    window: int = 0,
    n_grids: int = 3,
    valid=None,  # [N] bool; invalid rows (dead arena slots) are excluded
    refine_rounds: int = -1,  # NN-descent rounds; -1 = N-adaptive (1 or 2)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate self-KNN. Returns (idx [N, k], sqdist [N, k]), neighbor 0
    being the nearest (excluding self). With `valid`, dead rows neither
    distort the Morton bounding box (arena slots are parked at 1e6) nor
    appear as neighbors; their own rows are garbage and must not be read.

    window=0 picks an N-adaptive default. Defaults calibrated on the
    anisotropic refine-stage cloud (scripts/knn_recall.py): extra ROTATED
    grids beat a wider window at equal candidate count (w32/g3 0.911 vs
    w64/g2 0.888 @100k); w48/g3 reaches 0.941 @100k. Self-KNN runs off
    the hot loop (every-500-iters resets / init), so the larger candidate
    set is cheap insurance."""
    n = points.shape[0]
    if window == 0:
        window = 48 if n <= (1 << 18) else 64
    if refine_rounds < 0:
        # one NN-descent round converges to ~0.99 recall below ~1M points;
        # the larger clouds where window recall drops furthest get two
        # (self-KNN runs off the hot loop — every-500-iters resets/init)
        refine_rounds = 1 if n <= (1 << 20) else 2

    ranks_orders = []
    for g in range(n_grids):
        # rotated Morton curves per grid (see _grid_rotation)
        pg = points if g == 0 else _rotate(points, _grid_rotation(g))
        if valid is None:
            lo = jnp.min(pg, axis=0)
            hi = jnp.max(pg, axis=0)
        else:
            big = jnp.float32(3e38)
            lo = jnp.min(jnp.where(valid[:, None], pg, big), axis=0)
            hi = jnp.max(jnp.where(valid[:, None], pg, -big), axis=0)
        codes = morton_codes(pg, lo, hi)
        if valid is not None:
            codes = jnp.where(valid, codes, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(codes)
        rank = jnp.argsort(order)  # position of each point in sorted order
        ranks_orders.append((rank, order))
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    valid_f = valid

    def one_block(args):
        # blocked candidates + component-wise distances: [B, C] arrays
        # only ([N, C, 3] point-triple gathers are lane-padded 42x and OOM
        # at millions of points)
        q, ranks, base = args
        b = q.shape[0]
        cand_list = []
        offs = jnp.arange(-window, window + 1)
        for g in range(n_grids):
            cand_pos = jnp.clip(ranks[:, g][:, None] + offs[None, :], 0, n - 1)
            cand_list.append(ranks_orders[g][1][cand_pos])
        cand = jnp.concatenate(cand_list, axis=1)  # [B, C]
        dx = px[cand] - q[:, 0:1]
        dy = py[cand] - q[:, 1:2]
        dz = pz[cand] - q[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        self_mask = cand == (base + jnp.arange(b))[:, None]
        d2 = jnp.where(self_mask, jnp.inf, d2)
        if valid_f is not None:
            d2 = jnp.where(valid_f[cand], d2, jnp.inf)
        # de-duplicate candidates repeated across grids
        order_c = jnp.argsort(cand, axis=1, stable=True)
        cand_sorted = jnp.take_along_axis(cand, order_c, axis=1)
        dup_sorted = jnp.concatenate(
            [
                jnp.zeros((b, 1), bool),
                cand_sorted[:, 1:] == cand_sorted[:, :-1],
            ],
            axis=1,
        )
        dup = jnp.zeros_like(dup_sorted).at[
            jnp.arange(b)[:, None], order_c
        ].set(dup_sorted)
        d2 = jnp.where(dup, jnp.inf, d2)
        neg_d2, top_idx = jax.lax.top_k(-d2, k)
        return jnp.take_along_axis(cand, top_idx, axis=1), -neg_d2

    all_ranks = jnp.stack([r for r, _o in ranks_orders], axis=1)  # [N, G]
    blk = 131072
    if n <= blk:
        idx, d2 = one_block((points, all_ranks, jnp.int32(0)))
        if refine_rounds > 0:
            idx, d2 = _nn_descent(points, idx, d2, valid, refine_rounds)
        return idx, d2
    pad = (-n) % blk
    qp = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)])
    rp = jnp.concatenate(
        [all_ranks, jnp.zeros((pad, all_ranks.shape[1]), all_ranks.dtype)]
    )
    bases = jnp.arange(0, n + pad, blk, dtype=jnp.int32)
    idx, d2 = jax.lax.map(
        one_block,
        (
            qp.reshape(-1, blk, 3),
            rp.reshape(-1, blk, all_ranks.shape[1]),
            bases,
        ),
    )
    idx, d2 = idx.reshape(-1, k)[:n], d2.reshape(-1, k)[:n]
    if refine_rounds > 0:
        idx, d2 = _nn_descent(points, idx, d2, valid, refine_rounds)
    return idx, d2


def _nn_descent(points, idx, d2, valid, rounds):
    """NN-descent refinement: for each point, consider its neighbors'
    neighbors as candidates and keep the exact top-k of current+candidate
    sets. One round lifts Morton-window recall @2M from ~0.86 to >0.95 —
    a missed true neighbor is almost always a neighbor of a found one
    (the standard k-NN-graph convergence argument; Dong et al.'s
    NN-Descent, WWW'11). Blocked like the main pass: [B, k + k^2]
    candidate tiles keep peak memory bounded at any N."""
    n, k = idx.shape
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]

    def one_block(args):
        blk_idx, blk_d2, q, base = args
        b = blk_idx.shape[0]
        # neighbors-of-neighbors: rows of idx gathered by this block's
        # neighbor ids (invalid rows never appear as neighbors, so the
        # gathered rows are always live rows' lists)
        cand = jnp.concatenate(
            [blk_idx, idx[blk_idx].reshape(b, k * k)], axis=1
        )  # [B, k + k^2]
        dx = px[cand] - q[:, 0:1]
        dy = py[cand] - q[:, 1:2]
        dz = pz[cand] - q[:, 2:3]
        d2c = dx * dx + dy * dy + dz * dz
        d2c = jnp.where(
            cand == (base + jnp.arange(b))[:, None], jnp.inf, d2c
        )
        if valid is not None:
            d2c = jnp.where(valid[cand], d2c, jnp.inf)
        # de-duplicate (same sort trick as the main pass)
        order_c = jnp.argsort(cand, axis=1, stable=True)
        cand_sorted = jnp.take_along_axis(cand, order_c, axis=1)
        dup_sorted = jnp.concatenate(
            [
                jnp.zeros((b, 1), bool),
                cand_sorted[:, 1:] == cand_sorted[:, :-1],
            ],
            axis=1,
        )
        dup = jnp.zeros_like(dup_sorted).at[
            jnp.arange(b)[:, None], order_c
        ].set(dup_sorted)
        d2c = jnp.where(dup, jnp.inf, d2c)
        neg, top = jax.lax.top_k(-d2c, k)
        return jnp.take_along_axis(cand, top, axis=1), -neg

    blk = 65536
    for _ in range(rounds):
        if n <= blk:
            idx, d2 = one_block((idx, d2, points, jnp.int32(0)))
        else:
            pad = (-n) % blk
            ip = jnp.concatenate([idx, jnp.zeros((pad, k), idx.dtype)])
            dp = jnp.concatenate([d2, jnp.full((pad, k), jnp.inf, d2.dtype)])
            qp = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)])
            bases = jnp.arange(0, n + pad, blk, dtype=jnp.int32)
            i2, dd = jax.lax.map(
                one_block,
                (
                    ip.reshape(-1, blk, k),
                    dp.reshape(-1, blk, k),
                    qp.reshape(-1, blk, 3),
                    bases,
                ),
            )
            idx, d2 = i2.reshape(-1, k)[:n], dd.reshape(-1, k)[:n]
    return idx, d2


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_query_exact(queries, refs, k):
    """Exact KNN via chunked brute force (small reference sets)."""

    def one_chunk(q):  # [B, 3]
        diff = refs[None] - q[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)  # [B, N]
        neg_d2, idx = jax.lax.top_k(-d2, k)
        return idx, -neg_d2

    m = queries.shape[0]
    b = 4096
    pad = (-m) % b
    qp = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)])
    idx, d2 = jax.lax.map(one_chunk, qp.reshape(-1, b, 3))
    return idx.reshape(-1, k)[:m], d2.reshape(-1, k)[:m]


def knn_prepare(
    refs: jnp.ndarray,  # [N, 3]
    bbox_points: jnp.ndarray,  # [Q, 3] points the queries will span
    n_grids: int = 3,
):
    """Build the Morton-window search index over the reference cloud ONCE
    (per-grid ref sorts are the expensive part: n_grids argsorts of N).
    `bbox_points` must cover the eventual queries — the Morton
    quantization uses the JOINT bbox of refs and queries; with a
    refs-only bbox, a query outside the refs' extent gets a clipped code
    and lands arbitrarily far from its true neighbors in sorted order.
    Returns an index pytree for knn_query_indexed; reuse it across every
    query block against the same refs (e.g. the 84-block-per-camera
    extraction sweep re-sorted the refs 3 x 84 times per camera without
    it)."""
    orders, sorted_codes_list, bounds, rots = [], [], [], []
    for g in range(n_grids):
        rot = _grid_rotation(g)
        rg = refs if g == 0 else _rotate(refs, rot)
        qg = bbox_points if g == 0 else _rotate(bbox_points, rot)
        lo = jnp.minimum(jnp.min(rg, axis=0), jnp.min(qg, axis=0))
        hi = jnp.maximum(jnp.max(rg, axis=0), jnp.max(qg, axis=0))
        ref_codes = morton_codes(rg, lo, hi)
        order = jnp.argsort(ref_codes).astype(jnp.int32)
        orders.append(order)
        sorted_codes_list.append(ref_codes[order])
        bounds.append((lo, hi))
        rots.append(rot)
    return {
        "orders": orders,
        "sorted_codes": sorted_codes_list,
        "bounds": bounds,
        "rots": rots,
        "refs": refs,
    }


def knn_query_indexed(
    index,
    queries: jnp.ndarray,  # [M, 3]
    k: int = 16,
    window: int = 48,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Morton-window KNN against a prepared index (knn_prepare). The
    queries must lie inside the bbox the index was prepared with."""
    refs = index["refs"]
    n = refs.shape[0]
    m = queries.shape[0]
    n_grids = len(index["orders"])
    orders = index["orders"]
    sorted_codes_list = index["sorted_codes"]
    bounds = index["bounds"]
    rots = index["rots"]
    rx, ry, rz = refs[:, 0], refs[:, 1], refs[:, 2]

    def one_block(q):  # [B, 3] — bounded memory per block
        b = q.shape[0]
        cand_list = []
        for g in range(n_grids):
            qg = q if g == 0 else _rotate(q, rots[g])
            q_codes = morton_codes(qg, bounds[g][0], bounds[g][1])
            pos = jnp.searchsorted(
                sorted_codes_list[g], q_codes
            ).astype(jnp.int32)
            offs = jnp.arange(-window, window + 1)
            cand_pos = jnp.clip(pos[:, None] + offs[None, :], 0, n - 1)
            cand_list.append(orders[g][cand_pos])
        cand = jnp.concatenate(cand_list, axis=1)  # [B, C]
        # component-wise distances: [B, C] arrays only — gathering [B,C,3]
        # point triples materializes a lane-padded monster at scale (a 5M-
        # query extraction pass OOM'd at 546 GB before this formulation)
        dx = rx[cand] - q[:, 0:1]
        dy = ry[cand] - q[:, 1:2]
        dz = rz[cand] - q[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        # de-duplicate repeats (window-edge clipping + cross-grid overlap)
        order_c = jnp.argsort(cand, axis=1, stable=True)
        cand_sorted = jnp.take_along_axis(cand, order_c, axis=1)
        dup_sorted = jnp.concatenate(
            [
                jnp.zeros((b, 1), bool),
                cand_sorted[:, 1:] == cand_sorted[:, :-1],
            ],
            axis=1,
        )
        dup = jnp.zeros_like(dup_sorted).at[
            jnp.arange(b)[:, None], order_c
        ].set(dup_sorted)
        d2 = jnp.where(dup, jnp.inf, d2)
        neg_d2, top_idx = jax.lax.top_k(-d2, k)
        return jnp.take_along_axis(cand, top_idx, axis=1), -neg_d2

    blk = 131072
    if m <= blk:
        return one_block(queries)
    pad = (-m) % blk
    qp = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)])
    idx, d2 = jax.lax.map(one_block, qp.reshape(-1, blk, 3))
    return idx.reshape(-1, k)[:m], d2.reshape(-1, k)[:m]


@functools.partial(jax.jit, static_argnames=("k", "window", "n_grids"))
def knn_query(
    queries: jnp.ndarray,  # [M, 3]
    refs: jnp.ndarray,  # [N, 3]
    k: int = 16,
    window: int = 48,
    n_grids: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KNN of queries against a reference cloud (replaces pytorch3d
    knn_points(queries, refs)). Returns (idx [M, k], sqdist).

    Exact (chunked brute force) when the reference set is small;
    otherwise Morton-window approximate over rotated grids via
    knn_prepare + knn_query_indexed (one-shot; reuse knn_prepare
    yourself when issuing many query batches against fixed refs)."""
    n = refs.shape[0]
    if n <= 16384:
        return _knn_query_exact(queries, refs, k)
    index = knn_prepare(refs, queries, n_grids=n_grids)
    return knn_query_indexed(index, queries, k=k, window=window)


def mean_knn_sqdist(points: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Device-side analogue of simple-knn distCUDA2: mean squared distance
    to the k nearest neighbors."""
    _, d2 = knn(points, k=k)
    d2 = jnp.where(jnp.isfinite(d2), d2, 0.0)
    return jnp.mean(d2, axis=1)
