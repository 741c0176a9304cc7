"""Sharded (data x tile, primitive-sharded preprocess) training-step
correctness on the 8-device virtual CPU mesh: loss/update direction must
match the single-device path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frosting_tpu.ops.ssim import l1_loss, ssim
from frosting_tpu.raster import RasterConfig, render
from frosting_tpu.scene import synthetic
from frosting_tpu.scene.gaussians import activate
from frosting_tpu.train import gs_trainer
from frosting_tpu.parallel import sharded_train as st


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    rcfg = RasterConfig(
        width=64, height=64, tile_w=32, tile_h=16, chunk=32,
        max_instances=4096, backend="jax",
    )
    cfg = gs_trainer.GSTrainConfig(capacity=512, white_background=False)
    gt = synthetic.gaussian_blob_scene(n=300, seed=2)
    cams = synthetic.camera_ring(n_cams=2, radius=3.0)
    bg = jnp.zeros((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, bg)
    pts, cols = synthetic.degraded_init(gt, keep=0.9, jitter=0.02)

    state, tx = gs_trainer.init_state(pts, cols, 3.3, cfg)

    mesh = st.make_mesh(n_data=2, n_tile=4)
    step = st.make_sharded_train_step(tx, rcfg, cfg, mesh)
    cam_batch = st.stack_cameras(cams)
    cams_s, gts_s = st.shard_batch(mesh, cam_batch, jnp.asarray(gt_imgs))
    new_state, metrics = step(state, cams_s, gts_s)
    assert np.isfinite(float(metrics["loss"]))
    assert not bool(metrics["overflow"])

    # single-device reference: the TRUE batch-mean full-image loss (the
    # sharded SSIM is exact across strip seams via halo exchange)
    def ref_loss(params):
        means, scales, quats, opac, sh = activate(params)
        total = 0.0
        for i, cam in enumerate(cams):
            out = render(
                means, scales, quats, opac, sh, cam, rcfg, bg=bg,
                active_sh_degree=cfg.sh_degree,
            )
            ll1 = l1_loss(out.image, jnp.asarray(gt_imgs[i]))
            dssim = 1.0 - ssim(out.image, jnp.asarray(gt_imgs[i]))
            total += (1 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * dssim
        return total / len(cams)

    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(state.params)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_ref), rtol=2e-4
    )

    # parameter update direction must match adam(ref grads)
    fields = ["means3d", "sh_dc", "scales_log", "opacities_raw", "quats_raw"]
    updates, _ = tx.update(grads_ref, tx.init(state.params), state.params)
    ref_upd = np.concatenate(
        [np.asarray(getattr(updates, n)).ravel() for n in fields]
    )
    upd = np.concatenate(
        [
            (
                np.asarray(getattr(new_state.params, n))
                - np.asarray(getattr(state.params, n))
            ).ravel()
            for n in fields
        ]
    )
    cos = float(
        np.dot(upd, ref_upd)
        / (np.linalg.norm(upd) * np.linalg.norm(ref_upd) + 1e-12)
    )
    assert cos > 0.999, cos

    # ---- param+Adam+stats sharded route (ZeRO-3 over the primitive
    # axis) + DEVICE-SIDE sharded densification ----
    state_sh = st.shard_train_state(mesh, state)
    step_sh = st.make_sharded_train_step(
        tx, rcfg, cfg, mesh, shard_params=True
    )
    s_sh, m_sh = step_sh(state_sh, cams_s, gts_s)
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(metrics["loss"]), rtol=1e-5
    )
    upd_sh = np.concatenate(
        [
            (
                np.asarray(getattr(s_sh.params, n))
                - np.asarray(getattr(state.params, n))
            ).ravel()
            for n in fields
        ]
    )
    cos_sh = float(
        np.dot(upd_sh, upd)
        / (np.linalg.norm(upd_sh) * np.linalg.norm(upd) + 1e-12)
    )
    assert cos_sh > 0.9999, cos_sh
    n_chips = mesh.devices.size
    cap = state.params.capacity
    for arr in (s_sh.params.means3d, s_sh.dstate.grad_accum, s_sh.max_radii):
        assert arr.sharding.shard_shape(arr.shape)[0] == cap // n_chips

    # densify on the sharded state: run a few more steps to accumulate
    # stats with a LOW threshold so clones fire, then densify per shard
    cfg_lo = dataclasses.replace(cfg, densify_grad_threshold=1e-6)
    step_lo = st.make_sharded_train_step(
        tx, rcfg, cfg_lo, mesh, shard_params=True
    )
    for _ in range(3):
        s_sh, _m = step_lo(s_sh, cams_s, gts_s)
    n_before = int(np.asarray(s_sh.params.num_active()))
    dstep = st.make_sharded_densify_step(mesh, 3.3, cfg_lo)
    s_d, info = dstep(s_sh, jax.random.key(7), use_size_prune=False)
    n_after = int(np.asarray(s_d.params.num_active()))
    grew = int(np.asarray(info.n_cloned)) + int(np.asarray(info.n_split))
    assert grew > 0, "low threshold must produce clone/split requests"
    assert n_after > n_before, (n_before, n_after)
    # state stays sharded and finite after surgery
    assert s_d.params.means3d.sharding.shard_shape(
        s_d.params.means3d.shape
    )[0] == cap // n_chips
    assert np.isfinite(np.asarray(s_d.params.means3d)).all()
    # a post-densify train step still runs and is finite
    s_d2, m_d2 = step_lo(s_d, cams_s, gts_s)
    assert np.isfinite(float(m_d2["loss"]))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_frosting_refine_matches_single_device():
    """The REFINE stage (the 2-5M-gaussian hot loop, refine.py:464-571)
    sharded over (data x tile) with primitive-sharded frosting activation
    must match the single-device step: loss and update direction."""
    import dataclasses

    from frosting_tpu.extract.shell import ShellConfig, extract_shell
    from frosting_tpu.models import frosting as frosting_lib
    from frosting_tpu.parallel import sharded_frosting as sf
    from frosting_tpu.scene.gaussians import create_from_pcd
    from frosting_tpu.train import frosting_trainer

    rcfg = RasterConfig(
        width=64, height=64, tile_w=32, tile_h=16, chunk=32,
        max_instances=16384, backend="jax",
    )
    rng = np.random.default_rng(0)
    d = rng.normal(size=(300, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    means = jnp.asarray(d, jnp.float32)
    gt = (
        means,
        jnp.full((300, 3), 0.06, jnp.float32),
        jnp.asarray(
            np.concatenate([np.ones((300, 1)), np.zeros((300, 3))], 1),
            jnp.float32,
        ),
        jnp.full((300,), 0.9, jnp.float32),
        jnp.asarray(
            np.concatenate(
                [((np.asarray(means) + 1.5) / 3.0)[:, None],
                 np.zeros((300, 15, 3))], 1
            ),
            jnp.float32,
        ),
    )
    cams = synthetic.camera_ring(n_cams=2, radius=3.2)
    bg = jnp.zeros((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, bg)

    verts, faces, _aux = extract_shell(
        gt[0], gt[1], gt[2], gt[3], cams, rcfg,
        ShellConfig(poisson_resolution=48, target_vertices=800, knn_k=8),
    )
    # bg source: a few points outside the bbox; capacities divisible by 4
    pts = np.concatenate(
        [np.asarray(gt[0]), rng.uniform(2.0, 3.0, (84, 3)).astype(np.float32)]
    )
    gaussians = create_from_pcd(
        pts, rng.uniform(0.2, 0.8, (len(pts), 3)), capacity=384
    )
    fcfg = frosting_lib.FrostingConfig(
        n_gaussians=1024, knn_k=8, avoid_self_intersections=False
    )
    fparams, meta = frosting_lib.init_frosting(
        jax.random.key(0), verts, faces, gt[0], gt[1], gt[2], gt[3],
        gaussians, fcfg, 3.5, use_background=True,
    )
    assert fparams.bg is not None

    tcfg = frosting_trainer.FrostingTrainConfig(
        iterations=1, lr_max_steps=10
    )
    tx = frosting_trainer.make_frosting_optimizer(tcfg, 3.5)
    opt_state = tx.init(fparams)

    from frosting_tpu.parallel import sharded_train as st

    mesh = st.make_mesh(n_data=2, n_tile=4)
    step = sf.make_sharded_frosting_step(tx, rcfg, tcfg, mesh, meta)
    cam_batch = st.stack_cameras(cams)
    cams_s, gts_s = st.shard_batch(mesh, cam_batch, jnp.asarray(gt_imgs))
    p_new, _opt, metrics = step(fparams, opt_state, cams_s, gts_s)
    assert np.isfinite(float(metrics["loss"]))
    assert not bool(metrics["overflow"])

    # single-device reference: the TRUE full-image loss (sharded SSIM is
    # exact via halo exchange)
    def ref_loss(params):
        means, scales, quats, opac, sh = frosting_lib.activate_frosting(
            params, meta
        )
        total = 0.0
        for i, cam in enumerate(cams):
            out = render(
                means, scales, quats, opac, sh, cam, rcfg, bg=bg,
                active_sh_degree=tcfg.sh_degree,
            )
            ll1 = l1_loss(out.image, jnp.asarray(gt_imgs[i]))
            dssim = 1.0 - ssim(out.image, jnp.asarray(gt_imgs[i]))
            total += (1 - tcfg.lambda_dssim) * ll1 + tcfg.lambda_dssim * dssim
        return total / len(cams)

    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(fparams)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_ref), rtol=3e-4
    )
    updates, _ = tx.update(grads_ref, tx.init(fparams), fparams)

    def flat(tree_new, tree_old=None):
        leaves = jax.tree.leaves(
            tree_new
            if tree_old is None
            else jax.tree.map(lambda a, b: a - b, tree_new, tree_old)
        )
        return np.concatenate([np.asarray(l).ravel() for l in leaves])

    ref_upd = flat(updates)
    upd = flat(p_new, fparams)
    cos = float(
        np.dot(upd, ref_upd)
        / (np.linalg.norm(upd) * np.linalg.norm(ref_upd) + 1e-12)
    )
    assert cos > 0.999, cos
    # background gaussians moved in the sharded step too
    assert float(jnp.abs(p_new.bg.sh_dc - fparams.bg.sh_dc).max()) > 0

    # regularize_shell parity: the sharded step's loss must equal the
    # single-device photometric + ONE normal-consistency term
    from frosting_tpu.ops import mesh as mesh_ops
    from frosting_tpu.train.frosting_trainer import (
        _shell_normal_consistency,
    )

    tcfg_reg = dataclasses.replace(
        tcfg, learn_shell=True, regularize_shell=True
    )
    tx_reg = frosting_trainer.make_frosting_optimizer(tcfg_reg, 3.5)
    step_reg = sf.make_sharded_frosting_step(
        tx_reg, rcfg, tcfg_reg, mesh, meta
    )
    _p2, _o2, m_reg = step_reg(
        fparams, tx_reg.init(fparams), cams_s, gts_s
    )
    pairs = jnp.asarray(
        mesh_ops.adjacent_face_pairs(np.asarray(meta.faces))
    )
    nc = float(_shell_normal_consistency(fparams, meta, pairs, tcfg_reg))
    assert nc > 0
    np.testing.assert_allclose(
        float(m_reg["loss"]), float(loss_ref) + nc, rtol=3e-4
    )

    # exchange-routed refine step matches too (loss exactly, direction)
    step_ex = sf.make_sharded_frosting_step(
        tx, rcfg, tcfg, mesh, meta,
        primitive_exchange=True, exchange_cap=1024 + 384,
    )
    p_ex, _o, m_ex = step_ex(fparams, opt_state, cams_s, gts_s)
    np.testing.assert_allclose(
        float(m_ex["loss"]), float(metrics["loss"]), rtol=1e-5
    )
    a = flat(p_new, fparams)
    bx = flat(p_ex, fparams)
    cos_ex = float(
        np.dot(a, bx) / (np.linalg.norm(a) * np.linalg.norm(bx) + 1e-12)
    )
    assert cos_ex > 0.999, cos_ex

    # param+Adam-sharded route (ZeRO-3 over the primitive axis): same
    # loss, same update, and each chip owns capacity/n_chips rows of the
    # big leaves AND their Adam moments
    p_sh = sf.shard_frosting_params(mesh, fparams)
    opt_sh = tx.init(p_sh)
    step_sh = sf.make_sharded_frosting_step(
        tx, rcfg, tcfg, mesh, meta, shard_params=True
    )
    p_new_sh, opt_new_sh, m_sh = step_sh(p_sh, opt_sh, cams_s, gts_s)
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(metrics["loss"]), rtol=1e-5
    )
    p_new_sh_host = jax.device_get(p_new_sh)
    bsh = flat(p_new_sh_host, fparams)
    cos_sh = float(
        np.dot(a, bsh) / (np.linalg.norm(a) * np.linalg.norm(bsh) + 1e-12)
    )
    assert cos_sh > 0.9999, cos_sh
    n_chips = mesh.devices.size
    cap = fparams.bary_logits.shape[0]
    got = p_new_sh.bary_logits.sharding.shard_shape(
        p_new_sh.bary_logits.shape
    )[0]
    assert got == cap // n_chips, (got, cap // n_chips)
    moments = [
        l
        for l in jax.tree.leaves(opt_new_sh)
        if hasattr(l, "sharding") and l.ndim >= 1 and l.shape[0] == cap
    ]
    assert moments, "no capacity-sized Adam state leaves found"
    for m in moments:
        assert m.sharding.shard_shape(m.shape)[0] == cap // n_chips


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_primitive_exchange_matches_all_gather():
    """The all_to_all instance exchange (per-chip memory scaling on the
    primitive axis, SURVEY §7) must reproduce the all-gather step: same
    loss, same update direction."""
    rcfg = RasterConfig(
        width=64, height=64, tile_w=32, tile_h=16, chunk=32,
        max_instances=4096, backend="jax",
    )
    cfg = gs_trainer.GSTrainConfig(capacity=512, white_background=False)
    gt = synthetic.gaussian_blob_scene(n=300, seed=2)
    cams = synthetic.camera_ring(n_cams=2, radius=3.0)
    bg = jnp.zeros((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, bg)
    pts, cols = synthetic.degraded_init(gt, keep=0.9, jitter=0.02)

    state, tx = gs_trainer.init_state(pts, cols, 3.3, cfg)
    mesh = st.make_mesh(n_data=2, n_tile=4)
    cam_batch = st.stack_cameras(cams)
    cams_s, gts_s = st.shard_batch(mesh, cam_batch, jnp.asarray(gt_imgs))

    step_ag = st.make_sharded_train_step(tx, rcfg, cfg, mesh)
    step_ex = st.make_sharded_train_step(
        tx, rcfg, cfg, mesh, primitive_exchange=True, exchange_cap=512
    )
    s_ag, m_ag = step_ag(state, cams_s, gts_s)
    s_ex, m_ex = step_ex(state, cams_s, gts_s)
    np.testing.assert_allclose(
        float(m_ex["loss"]), float(m_ag["loss"]), rtol=1e-5
    )
    a = np.asarray(s_ag.params.means3d) - np.asarray(state.params.means3d)
    b = np.asarray(s_ex.params.means3d) - np.asarray(state.params.means3d)
    cos = float(
        np.dot(a.ravel(), b.ravel())
        / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    )
    assert cos > 0.9999, cos


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_sugar_step():
    """Stage-2 (coarse SuGaR) sharded step: photometric phase matches the
    single-device loss exactly; the density-mode SDF phase (sample axis
    sharded) runs, regularizes, and keeps gradients finite."""
    from frosting_tpu.models import sugar as sugar_lib
    from frosting_tpu.ops import knn as knn_lib
    from frosting_tpu.parallel import sharded_sugar as ssg
    from frosting_tpu.train import sugar_trainer

    rcfg = RasterConfig(
        width=64, height=64, tile_w=32, tile_h=16, chunk=32,
        max_instances=4096, backend="jax",
    )
    gt = synthetic.gaussian_blob_scene(n=300, seed=2)
    cams = synthetic.camera_ring(n_cams=2, radius=3.0)
    bg = jnp.zeros((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, bg)
    pts, cols = synthetic.degraded_init(gt, keep=0.9, jitter=0.02)

    from frosting_tpu.train import gs_trainer

    state, _tx0 = gs_trainer.init_state(
        pts, cols, 3.3, gs_trainer.GSTrainConfig(capacity=512)
    )
    params = state.params
    scfg = sugar_trainer.SugarTrainConfig(
        method="density", n_sdf_samples=4096, knn_k=8, spatial_extent=3.3
    )
    from frosting_tpu.train import optimizer as opt_lib

    tx = opt_lib.make_gs_optimizer(3.3)
    opt_state = tx.init(params)
    knn_idx = sugar_trainer.compute_knn(params, scfg.knn_k)

    mesh = st.make_mesh(n_data=2, n_tile=4)
    cam_batch = st.stack_cameras(cams)
    cams_s, gts_s = st.shard_batch(mesh, cam_batch, jnp.asarray(gt_imgs))

    step_photo = ssg.make_sharded_sugar_step(tx, rcfg, scfg, mesh, "photo")
    p1, _o, m_photo = step_photo(
        params, opt_state, cams_s, gts_s, knn_idx, jax.random.key(0)
    )
    assert np.isfinite(float(m_photo["loss"]))

    # single-device reference: batch-mean photometric loss
    from frosting_tpu.scene.gaussians import activate

    def ref_loss(p):
        means, scales, quats, opac, sh = activate(p)
        total = 0.0
        for i, cam in enumerate(cams):
            out = render(
                means, scales, quats, opac, sh, cam, rcfg, bg=bg,
                active_sh_degree=scfg.sh_degree,
            )
            ll1 = l1_loss(out.image, jnp.asarray(gt_imgs[i]))
            dssim = 1.0 - ssim(out.image, jnp.asarray(gt_imgs[i]))
            total += (1 - scfg.lambda_dssim) * ll1 + scfg.lambda_dssim * dssim
        return total / len(cams)

    np.testing.assert_allclose(
        float(m_photo["loss"]), float(ref_loss(params)), rtol=2e-5
    )

    step_sdf = ssg.make_sharded_sugar_step(tx, rcfg, scfg, mesh, "sdf")
    p2, _o2, m_sdf = step_sdf(
        params, opt_state, cams_s, gts_s, knn_idx, jax.random.key(1)
    )
    assert np.isfinite(float(m_sdf["loss"]))
    # regularizers add loss beyond the photometric value
    assert float(m_sdf["loss"]) > float(m_photo["loss"])
    assert np.isfinite(np.asarray(p2.means3d[:300]).sum())

    # depth-anchored sdf mode (MipNeRF360 paper config,
    # coarse_sdf.py:577-650): strip-rendered depth all_gathered across the
    # tile axis; the step must run sharded with finite loss and updates
    scfg_sdf = sugar_trainer.SugarTrainConfig(
        method="sdf", n_sdf_samples=4096, knn_k=8, spatial_extent=3.3
    )
    step_sdf2 = ssg.make_sharded_sugar_step(tx, rcfg, scfg_sdf, mesh, "sdf")
    p3, _o3, m_sdf2 = step_sdf2(
        params, opt_state, cams_s, gts_s, knn_idx, jax.random.key(2)
    )
    assert np.isfinite(float(m_sdf2["loss"]))
    assert float(m_sdf2["loss"]) > float(m_photo["loss"])
    assert np.isfinite(np.asarray(p3.means3d[:300]).sum())
    moved = np.abs(np.asarray(p3.means3d[:300] - params.means3d[:300]))
    assert moved.max() > 0


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_strip_depth_assembly_matches_full_render():
    """The sharded sdf-mode depth map (per-strip render with view depth as
    color, strips concatenated along the tile axis) must equal the
    single-device full-image depth render used by
    render_depth_normal_maps."""
    from frosting_tpu.models import sugar as sugar_lib
    from frosting_tpu.parallel.sharded_train import strip_config
    from frosting_tpu.raster.preprocess import preprocess, shift_projected
    from frosting_tpu.raster.render import render_projected

    rcfg = RasterConfig(
        width=64, height=64, tile_w=32, tile_h=16, chunk=32,
        max_instances=4096, backend="jax",
    )
    gt = synthetic.gaussian_blob_scene(n=300, seed=5)
    cam = synthetic.camera_ring(n_cams=1, radius=3.0)[0]
    means, scales, quats, opac, sh = gt

    depth_ref, _nm, _acc = sugar_lib.render_depth_normal_maps(
        means, scales, quats, opac, cam, rcfg
    )

    n_tile = 4
    s_cfg = strip_config(rcfg, n_tile)
    proj_full = preprocess(means, scales, quats, opac, sh, cam, rcfg)
    strips = []
    for t in range(n_tile):
        proj = shift_projected(
            proj_full, (0, t * s_cfg.height), s_cfg, tile_aligned=True
        )
        dproj = proj._replace(
            colors=jnp.stack([proj.depths] * 3, axis=-1)
        )
        dout = render_projected(dproj, s_cfg, bg=jnp.zeros((3,)))
        acc = 1.0 - dout.t_final
        strips.append(dout.image[0] / jnp.maximum(acc, 1e-6))
    depth_strips = jnp.concatenate(strips, axis=0)
    np.testing.assert_allclose(
        np.asarray(depth_strips), np.asarray(depth_ref), rtol=2e-5, atol=2e-5
    )
