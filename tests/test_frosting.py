"""Frosting model/refinement quality from a clean Gaussian model: shell ->
init -> refine must reconstruct sharply (this isolates stages 3-5 from the
quality of the tiny-budget trainers in the integration test)."""

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.extract.shell import ShellConfig, extract_shell
from frosting_tpu.models import frosting as frosting_lib
from frosting_tpu.raster import RasterConfig, render
from frosting_tpu.scene import synthetic
from frosting_tpu.train import frosting_trainer
from frosting_tpu.ops.ssim import psnr


def _sphere_scene(n=1500, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    means = d * 1.0
    return (
        jnp.asarray(means, jnp.float32),
        jnp.full((n, 3), 0.06, jnp.float32),
        jnp.asarray(
            np.concatenate([np.ones((n, 1)), np.zeros((n, 3))], 1), jnp.float32
        ),
        jnp.full((n,), 0.9, jnp.float32),
        jnp.asarray(
            np.concatenate(
                [((means + 1.5) / 3.0)[:, None], np.zeros((n, 15, 3))], 1
            ),
            jnp.float32,
        ),
    )


def test_frosting_refine_quality():
    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=24576, backend="jax"
    )
    gt = _sphere_scene()
    cams = synthetic.camera_ring(n_cams=8, radius=3.2)
    bg = jnp.zeros((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, bg)

    verts, faces, _aux = extract_shell(
        gt[0], gt[1], gt[2], gt[3], cams, rcfg,
        ShellConfig(poisson_resolution=80, target_vertices=3000, knn_k=8),
    )
    fcfg = frosting_lib.FrostingConfig(n_gaussians=6000, knn_k=8)
    fparams, meta = frosting_lib.init_frosting(
        jax.random.key(0), verts, faces, gt[0], gt[1], gt[2], gt[3],
        None, fcfg, 3.5,
    )
    # sanity: layer geometry wraps the surface
    assert float(fparams.outer_dist.mean()) > 0
    assert float(fparams.inner_dist.mean()) < 0
    m, _, _, _, _ = frosting_lib.activate_frosting(fparams, meta)
    r = np.linalg.norm(np.asarray(m), axis=1)
    assert 0.75 < np.median(r) < 1.35

    fparams2, hist = frosting_trainer.train(
        fparams, meta, 3.5, cams, gt_imgs, rcfg,
        frosting_trainer.FrostingTrainConfig(
            iterations=300, lr_max_steps=300, log_every=100
        ),
        log_fn=None,
    )
    assert hist[-1]["psnr"] > 25.0, hist

    # occlusion-culling path runs and does not corrupt training
    vis = frosting_trainer.precompute_visibility(fparams2, meta, cams[:2], rcfg)
    assert vis.shape[1] == 6000
    assert 0.1 < vis.mean() < 1.0  # some faces culled per view


def test_background_gaussians_train():
    """With use_background=True, background Gaussians must RECEIVE updates
    during refinement (reference trains them with dedicated param groups,
    frosting_optimizer.py:85-91) while their mask stays fixed."""
    import dataclasses

    from frosting_tpu.scene.gaussians import create_from_pcd

    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=24576, backend="jax"
    )
    gt = _sphere_scene(n=400)
    cams = synthetic.camera_ring(n_cams=4, radius=3.2)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, jnp.zeros((3,)))

    # source 3DGS arena: surface points + far "background" points outside
    # the shell bbox
    rng = np.random.default_rng(1)
    pts = np.concatenate(
        [np.asarray(gt[0]), rng.uniform(2.0, 4.0, (100, 3)).astype(np.float32)]
    )
    cols = rng.uniform(0.2, 0.8, (len(pts), 3))
    gaussians = create_from_pcd(pts, cols, capacity=len(pts))

    verts, faces, _aux = extract_shell(
        gt[0], gt[1], gt[2], gt[3], cams, rcfg,
        ShellConfig(poisson_resolution=64, target_vertices=1500, knn_k=8),
    )
    fcfg = frosting_lib.FrostingConfig(n_gaussians=2000, knn_k=8)
    fparams, meta = frosting_lib.init_frosting(
        jax.random.key(0), verts, faces, gt[0], gt[1], gt[2], gt[3],
        gaussians, fcfg, 3.5, use_background=True,
    )
    assert fparams.bg is not None
    assert float(fparams.bg.mask.sum()) >= 100  # outside points marked bg

    tcfg = frosting_trainer.FrostingTrainConfig(iterations=3, lr_max_steps=3)
    tx = frosting_trainer.make_frosting_optimizer(tcfg, 3.5)
    opt_state = tx.init(fparams)
    p2, _, aux = frosting_trainer.frosting_train_step(
        fparams, opt_state, meta, cams[0], gt_imgs[0],
        jnp.ones(
            (fparams.bary_logits.shape[0] + fparams.bg.capacity,), jnp.float32
        ),
        tx, rcfg, tcfg, 3,
    )
    assert np.isfinite(float(aux["loss"]))
    # bg params moved; mask untouched
    assert float(jnp.abs(p2.bg.sh_dc - fparams.bg.sh_dc).max()) > 0
    assert float(jnp.abs(p2.bg.means3d - fparams.bg.means3d).max()) > 0
    np.testing.assert_array_equal(
        np.asarray(p2.bg.mask), np.asarray(fparams.bg.mask)
    )


def test_occlusion_culling_compacts_compute():
    """The culled step must (a) run on a COMPACTED subset (fewer rasterizer
    instances => preprocess/bin/blend cost actually shrinks, refine.py:
    487-492), and (b) match the full step with an opacity mask."""
    import dataclasses as dc

    from frosting_tpu.raster import render as raster_render

    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=24576, backend="jax"
    )
    gt = _sphere_scene(n=400)
    cams = synthetic.camera_ring(n_cams=3, radius=3.2)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, jnp.zeros((3,)))

    verts, faces, _aux = extract_shell(
        gt[0], gt[1], gt[2], gt[3], cams, rcfg,
        ShellConfig(poisson_resolution=64, target_vertices=1500, knn_k=8),
    )
    fcfg = frosting_lib.FrostingConfig(n_gaussians=3000, knn_k=8)
    fparams, meta = frosting_lib.init_frosting(
        jax.random.key(0), verts, faces, gt[0], gt[1], gt[2], gt[3],
        None, fcfg, 3.5,
    )

    vis = frosting_trainer.precompute_visibility(fparams, meta, cams, rcfg)
    assert 0.0 < float(vis[:, :3000].mean()) < 1.0  # some faces culled

    # the visibility mask zeroes opacity, and the opacity-aware rect cull
    # (preprocess.py) then produces ZERO instances for masked gaussians:
    # the culled step's binning/blend run on ~the visible subset, matching
    # the reference's "decreases optimization time and memory"
    # (refine.py:487-492, README.md:204) — not just a visual mask
    full = frosting_lib.activate_frosting(fparams, meta)
    m, sc, q, op, sh = full
    masked = (m, sc, q, op * jnp.asarray(vis[0]), sh)
    out_full = raster_render(*full, cams[0], rcfg)
    out_sub = raster_render(*masked, cams[0], rcfg)
    assert int(out_sub.num_instances) < int(out_full.num_instances)

    # the culled render must still approximate the full render for the
    # visible content: image-space PSNR guard against culling-quality
    # regressions (e.g. a broken mask index). The untrained init frosting
    # is semi-transparent, so hidden-face gaussians DO contribute a little
    # through the front shell — the reference documents the same "small
    # quality impact" (README.md:204); measured 19.7 dB on this scene.
    cull_psnr = float(psnr(out_sub.image, out_full.image))
    assert cull_psnr > 17.0, f"culled render diverges: {cull_psnr:.1f} dB"

    # one masked (culled) step runs and moves the params
    tcfg = frosting_trainer.FrostingTrainConfig(iterations=1, lr_max_steps=1)
    tx = frosting_trainer.make_frosting_optimizer(tcfg, 3.5)
    opt_state = tx.init(fparams)
    p_mask, _, aux_m = frosting_trainer.frosting_train_step(
        fparams, opt_state, meta, cams[0], gt_imgs[0],
        jnp.asarray(vis[0]), tx, rcfg, tcfg, 3,
    )
    assert np.isfinite(float(aux_m["loss"]))
    a = np.asarray(p_mask.bary_logits - fparams.bary_logits).ravel()
    assert np.abs(a).max() > 0


def test_self_intersection_avoidance():
    """Two facing sheets whose offsets grow toward each other must stop
    growing when their sheet vertices invade the opposite cells (the
    fm:398-435 incremental loop), instead of blowing through."""
    from frosting_tpu.ops import mesh as mesh_ops

    # plane A at z=0 (normals +z), plane B at z=1 (normals -z), facing
    def grid_plane(z, flip):
        n = 7
        xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
        v = np.stack([xs.ravel(), ys.ravel(), np.full(n * n, z)], 1)
        f = []
        for i in range(n - 1):
            for j in range(n - 1):
                a = i * n + j
                tri1 = [a, a + 1, a + n]
                tri2 = [a + 1, a + n + 1, a + n]
                if flip:
                    tri1, tri2 = tri1[::-1], tri2[::-1]
                f += [tri1, tri2]
        return v.astype(np.float32), np.asarray(f, np.int32)

    va, fa = grid_plane(0.0, flip=False)
    vb, fb = grid_plane(1.0, flip=True)
    # break the lateral degeneracy (aligned grids put sheet vertices
    # exactly ON the opposite cells' boundary planes)
    vb[:, 0] += 0.41 / 6.0
    vb[:, 1] += 0.23 / 6.0
    verts = jnp.asarray(np.concatenate([va, vb]), jnp.float32)
    faces = jnp.asarray(np.concatenate([fa, fb + len(va)]), jnp.int32)
    normals = mesh_ops.vertex_normals(verts, faces)
    # sanity on orientation: A's normals +z, B's normals -z
    assert float(normals[: len(va), 2].mean()) > 0.9
    assert float(normals[len(va):, 2].mean()) < -0.9

    nv = verts.shape[0]
    inner_t = jnp.full((nv,), -0.05, jnp.float32)
    outer_t = jnp.full((nv,), 0.8, jnp.float32)  # 2x0.8 > gap: sheets collide
    inner, outer = frosting_lib.avoid_self_intersections(
        verts, normals, faces, inner_t, outer_t, scene_scale=1.0, n_iters=20
    )
    # interior vertices must stop near half the gap, far below the target
    interior = np.asarray(
        (verts[:, 0] > 0.2) & (verts[:, 0] < 0.8)
        & (verts[:, 1] > 0.2) & (verts[:, 1] < 0.8)
    )
    assert float(jnp.max(outer[interior])) < 0.72  # stopped near half-gap
    # inner growth (away from the other sheet) is unconstrained
    np.testing.assert_allclose(np.asarray(inner), -0.05, atol=1e-5)

    # the loop can't prevent OTHER growing cells from engulfing an
    # already-frozen vertex (same property as the reference's loop), so
    # assert a strong reduction vs the unchecked result, not strict zero
    iv = verts + inner[:, None] * normals
    ov = verts + outer[:, None] * normals
    bad = int(frosting_lib.is_inside_cells(ov, iv, ov, faces, 1.0).sum())
    iv_n = verts + inner_t[:, None] * normals
    ov_n = verts + outer_t[:, None] * normals
    bad_naive = int(
        frosting_lib.is_inside_cells(ov_n, iv_n, ov_n, faces, 1.0).sum()
    )
    assert bad_naive > 20  # unchecked growth really does self-intersect
    assert bad < bad_naive // 2


def test_regularize_shell_normal_consistency():
    """regularize_shell must penalize bumpy learned offset surfaces and
    send gradients to the dists (the reference's term is inert: its shell
    verts never join the optimizer, frosting_optimizer.py:76)."""
    from frosting_tpu.ops import mesh as mesh_ops
    from frosting_tpu.train.frosting_trainer import (
        FrostingTrainConfig,
        _shell_normal_consistency,
    )

    # icosphere-ish shell: use the synthetic sphere + extract is overkill —
    # build a UV sphere directly
    nlat, nlon = 12, 24
    th = np.linspace(0.15, np.pi - 0.15, nlat)
    ph = np.linspace(0, 2 * np.pi, nlon, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    verts = np.stack(
        [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)], -1
    ).reshape(-1, 3)
    faces = []
    for i in range(nlat - 1):
        for j in range(nlon):
            a = i * nlon + j
            b = i * nlon + (j + 1) % nlon
            c = (i + 1) * nlon + j
            d = (i + 1) * nlon + (j + 1) % nlon
            faces += [[a, b, c], [b, d, c]]
    faces = np.asarray(faces, np.int32)
    pairs = jnp.asarray(mesh_ops.adjacent_face_pairs(faces))

    n_v = verts.shape[0]
    cfg = FrostingTrainConfig(
        learn_shell=True, regularize_shell=True,
        normal_consistency_factor=1.0,
    )
    meta = frosting_lib.FrostingMeta(
        faces=jnp.asarray(faces), cell_idx=jnp.zeros((1,), jnp.int32)
    )

    def term(outer):
        p = frosting_lib.FrostingParams(
            shell_verts=jnp.asarray(verts, jnp.float32),
            inner_dist=jnp.full((n_v,), -0.05, jnp.float32),
            outer_dist=outer,
            bary_logits=jnp.zeros((1, 6), jnp.float32),
            scales_log=jnp.zeros((1, 3), jnp.float32),
            quats_raw=jnp.asarray([[1.0, 0, 0, 0]], jnp.float32),
            opacities_raw=jnp.zeros((1,), jnp.float32),
            sh_dc=jnp.zeros((1, 1, 3), jnp.float32),
            sh_rest=jnp.zeros((1, 15, 3), jnp.float32),
        )
        return _shell_normal_consistency(p, meta, pairs, cfg)

    smooth = jnp.full((n_v,), 0.08, jnp.float32)
    bumpy = smooth + 0.06 * jnp.asarray(
        (np.arange(n_v) % 2) * 2.0 - 1.0, jnp.float32
    )
    l_s, l_b = float(term(smooth)), float(term(bumpy))
    assert l_b > l_s * 1.5, (l_s, l_b)
    g = np.asarray(jax.grad(lambda o: term(o))(bumpy))
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_sorted_corner_blend_matches_gather():
    """_blend_corners_sorted (prefix-difference backward) must match the
    plain gather+einsum path in value AND in gradients wrt bary logits,
    shell verts, and offsets."""
    import dataclasses

    rng = np.random.default_rng(7)
    nv, nf, n = 40, 60, 500
    verts = rng.normal(size=(nv, 3)).astype(np.float32)
    faces = rng.integers(0, nv, (nf, 3)).astype(np.int32)
    cell_idx = np.sort(rng.integers(0, nf, n)).astype(np.int32)
    bounds = np.searchsorted(cell_idx, np.arange(nf + 1), "left").astype(
        np.int32
    )
    p = frosting_lib.FrostingParams(
        shell_verts=jnp.asarray(verts),
        inner_dist=jnp.asarray(-np.abs(rng.normal(0.05, 0.01, nv)), jnp.float32),
        outer_dist=jnp.asarray(np.abs(rng.normal(0.1, 0.02, nv)), jnp.float32),
        bary_logits=jnp.asarray(rng.normal(0, 1, (n, 6)), jnp.float32),
        scales_log=jnp.zeros((n, 3)),
        quats_raw=jnp.concatenate([jnp.ones((n, 1)), jnp.zeros((n, 3))], 1),
        opacities_raw=jnp.zeros((n,)),
        sh_dc=jnp.zeros((n, 1, 3)),
        sh_rest=jnp.zeros((n, 15, 3)),
    )
    fj = jnp.asarray(faces)
    ci = jnp.asarray(cell_idx)
    cb = jnp.asarray(bounds)
    salt = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    def loss(pp, use_bounds):
        m = frosting_lib.gaussian_centers(
            pp, fj, ci, cb if use_bounds else None
        )
        return jnp.sum(m * salt)

    v0 = float(loss(p, False))
    v1 = float(loss(p, True))
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    g0 = jax.grad(lambda pp: loss(pp, False))(p)
    g1 = jax.grad(lambda pp: loss(pp, True))(p)
    for f in dataclasses.fields(frosting_lib.FrostingParams):
        if f.name == "bg":
            continue
        a, b = np.asarray(getattr(g0, f.name)), np.asarray(getattr(g1, f.name))
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=2e-5, err_msg=f.name
        )


def test_cell_allocation_volume_proportional():
    """init_frosting's cell sampling (inverse-CDF, replacing the
    jax.random.categorical whose [n, F] Gumbel matrix hit 440 GB at
    reference budgets) must still allocate gaussians ~proportional to
    cell volume."""
    gt = _sphere_scene(400)
    rcfg = RasterConfig(
        width=64, height=64, tile_w=32, tile_h=32, chunk=32,
        max_instances=4096, backend="jax",
    )
    cams = synthetic.camera_ring(n_cams=2, radius=3.0)
    verts, faces, _aux = extract_shell(
        gt[0], gt[1], gt[2], gt[3], cams, rcfg,
        ShellConfig(poisson_resolution=32, target_vertices=400, knn_k=8),
    )
    fcfg = frosting_lib.FrostingConfig(
        n_gaussians=20000, knn_k=8, avoid_self_intersections=False
    )
    fparams, meta = frosting_lib.init_frosting(
        jax.random.key(0), verts, faces, gt[0], gt[1], gt[2], gt[3],
        None, fcfg, 3.0,
    )
    counts = np.bincount(
        np.asarray(meta.cell_idx), minlength=len(np.asarray(faces))
    )
    # recompute the allocation weights the same way init does
    from frosting_tpu.ops import mesh as mesh_ops

    areas = np.asarray(
        mesh_ops.face_areas(jnp.asarray(verts, jnp.float32), meta.faces)
    )
    # correlation between counts and areas*thickness proxy: with uniform
    # thickness on this shell, counts ~ areas
    c = np.corrcoef(counts, areas)[0, 1]
    assert c > 0.7, c
    # cell_idx is sorted (prefix-diff backward contract) and in range
    ci = np.asarray(meta.cell_idx)
    assert (np.diff(ci) >= 0).all()
    assert ci.min() >= 0 and ci.max() < len(np.asarray(faces))
