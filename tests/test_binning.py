"""Direct invariants of the pad-in-sort binning (raster/binning.py):
layout alignment, sentinel hygiene, permutation inverses, histogram
exactness — checked against a brute-force python expansion."""

import numpy as np
import jax.numpy as jnp

from frosting_tpu.raster.binning import bin_gaussians, _tile_counts_2d
from frosting_tpu.raster.config import RasterConfig


def make_rects(n, cfg, seed=0, p_invalid=0.2):
    rng = np.random.default_rng(seed)
    tx0 = rng.integers(0, cfg.tiles_x, n)
    ty0 = rng.integers(0, cfg.tiles_y, n)
    w = rng.integers(1, 4, n)
    h = rng.integers(1, 4, n)
    tx1 = np.minimum(tx0 + w, cfg.tiles_x)
    ty1 = np.minimum(ty0 + h, cfg.tiles_y)
    rect = np.stack([tx0, ty0, tx1, ty1], 1).astype(np.int32)
    valid = rng.uniform(size=n) > p_invalid
    depths = rng.uniform(0.5, 10.0, n).astype(np.float32)
    return rect, depths, valid


def brute_force(rect, depths, valid, cfg):
    """instances per tile in (depth, gaussian) order."""
    per_tile = {t: [] for t in range(cfg.n_tiles)}
    order = np.argsort(depths, kind="stable")
    rank = np.empty(len(depths), np.int64)
    rank[order] = np.arange(len(depths))
    for g in range(rect.shape[0]):
        if not valid[g]:
            continue
        x0, y0, x1, y1 = rect[g]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                per_tile[ty * cfg.tiles_x + tx].append((rank[g], g))
    for t in per_tile:
        per_tile[t].sort()
    return {t: [g for _r, g in v] for t, v in per_tile.items()}


CFG = RasterConfig(
    width=128, height=64, tile_w=32, tile_h=16, chunk=32,
    max_instances=4096, backend="jax",
)


def test_padded_layout_matches_brute_force():
    rect, depths, valid = make_rects(300, CFG, seed=3)
    b = bin_gaussians(
        jnp.asarray(rect), jnp.asarray(depths), jnp.asarray(valid), CFG
    )
    ref = brute_force(rect, depths, valid, CFG)
    padded_gauss = np.asarray(b.padded_gauss)
    block0 = np.asarray(b.tile_block0)
    nch = np.asarray(b.tile_nchunks)
    n = rect.shape[0]
    assert not bool(b.overflow)
    assert int(b.num_instances) == sum(len(v) for v in ref.values())
    for t in range(CFG.n_tiles):
        start = block0[t] * CFG.chunk
        run = padded_gauss[start : start + nch[t] * CFG.chunk]
        got = run[run < n].tolist()
        assert got == ref[t], f"tile {t}"
        # padding rows carry the sentinel and sit AFTER the real run
        n_real = len(ref[t])
        assert (run[n_real:] == n).all()
        # chunk alignment: every tile starts at a block boundary and owns
        # at least one chunk
        assert nch[t] >= 1


def test_orig_s_roundtrip():
    rect, depths, valid = make_rects(200, CFG, seed=4)
    b = bin_gaussians(
        jnp.asarray(rect), jnp.asarray(depths), jnp.asarray(valid), CFG
    )
    padded_gauss = np.asarray(b.padded_gauss)
    orig_s = np.asarray(b.orig_s)
    bounds = np.asarray(b.gauss_bounds)
    total = int(b.num_instances)
    n = rect.shape[0]
    # invert orig_s: inv[orig_s[row]] = row maps orig instance -> padded row
    inv_map = np.full(len(orig_s), -1, np.int64)
    inv_map[orig_s] = np.arange(len(orig_s))
    # expansion instance i belongs to DEPTH-SORTED gaussian j with
    # bounds[j] <= i < bounds[j+1]; its padded row must hold that
    # gaussian's ORIGINAL id (gauss_sorted[j])
    gauss_sorted = np.asarray(b.gauss_sorted)
    assert sorted(gauss_sorted.tolist()) == list(range(n))
    for j in range(n):
        for i in range(bounds[j], bounds[j + 1]):
            assert padded_gauss[inv_map[i]] == gauss_sorted[j]
    # each real padded row is hit exactly once
    rows = inv_map[:total]
    assert len(set(rows.tolist())) == total
    # non-real rows (synthesized pads and invalid instance slots) carry
    # orig indices >= total, so a sort keyed on orig_s pushes them past
    # every real instance — the backward's prefix-diff at gauss_bounds
    # (all <= total) never reads them
    pad_rows = np.setdiff1d(np.arange(len(orig_s)), rows)
    assert (orig_s[pad_rows] >= total).all()


def test_histogram_matches_expansion_counts():
    rect, depths, valid = make_rects(500, CFG, seed=5)
    counts = np.asarray(
        _tile_counts_2d(jnp.asarray(rect), jnp.asarray(valid), CFG)
    )
    ref = brute_force(rect, depths, valid, CFG)
    for t in range(CFG.n_tiles):
        assert counts[t] == len(ref[t]), f"tile {t}"


def test_empty_and_single_gaussian():
    rect = np.asarray([[0, 0, 1, 1]], np.int32)
    depths = np.asarray([1.0], np.float32)
    b = bin_gaussians(
        jnp.asarray(rect), jnp.asarray(depths),
        jnp.asarray([False]), CFG,
    )
    assert int(b.num_instances) == 0
    assert (np.asarray(b.padded_gauss) == 1).all()  # all sentinel
    b2 = bin_gaussians(
        jnp.asarray(rect), jnp.asarray(depths), jnp.asarray([True]), CFG
    )
    assert int(b2.num_instances) == 1
    pg = np.asarray(b2.padded_gauss)
    assert pg[np.asarray(b2.tile_block0)[0] * CFG.chunk] == 0


def test_overflow_flag_sets():
    cfg = RasterConfig(
        width=128, height=64, tile_w=32, tile_h=16, chunk=32,
        max_instances=32, backend="jax",
    )
    rect, depths, valid = make_rects(300, cfg, seed=6, p_invalid=0.0)
    b = bin_gaussians(
        jnp.asarray(rect), jnp.asarray(depths), jnp.asarray(valid), cfg
    )
    assert bool(b.overflow)


def test_decode_gather_matches_scatter():
    """The searchsorted+lane-gather decode (round 4) must produce the
    identical Binned result as the diff-scatter decode on every channel
    that feeds the kernels."""
    import dataclasses

    import numpy as np

    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.raster.binning import bin_gaussians

    rng = np.random.default_rng(7)
    n = 4000
    cfg_g = RasterConfig(
        width=256, height=192, tile_w=32, tile_h=16, chunk=32,
        max_instances=1 << 15, backend="jax", decode="gather",
    )
    cfg_s = dataclasses.replace(cfg_g, decode="scatter")
    rect = np.zeros((n, 4), np.int32)
    rect[:, 0] = rng.integers(0, cfg_g.tiles_x, n)
    rect[:, 1] = rng.integers(0, cfg_g.tiles_y, n)
    rect[:, 2] = rect[:, 0] + rng.integers(1, 4, n)
    rect[:, 3] = rect[:, 1] + rng.integers(1, 3, n)
    rect[:, 2] = np.minimum(rect[:, 2], cfg_g.tiles_x)
    rect[:, 3] = np.minimum(rect[:, 3], cfg_g.tiles_y)
    depths = rng.uniform(0.5, 5.0, n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1
    bg = bin_gaussians(jnp.asarray(rect), jnp.asarray(depths),
                       jnp.asarray(valid), cfg_g)
    bs = bin_gaussians(jnp.asarray(rect), jnp.asarray(depths),
                       jnp.asarray(valid), cfg_s)
    assert int(bg.num_instances) == int(bs.num_instances)
    for name in ("padded_gauss", "work_block", "work_meta", "work_pxy",
                 "tile_block0", "tile_nchunks", "orig_s", "gauss_sorted",
                 "gauss_bounds"):
        a, b = np.asarray(getattr(bg, name)), np.asarray(getattr(bs, name))
        np.testing.assert_array_equal(a, b, err_msg=name)
