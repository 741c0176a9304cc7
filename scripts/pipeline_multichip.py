"""BASELINE gated config (5) stand-in: the FULL five-stage pipeline with
every trainable stage running its SHARDED step over a device mesh.

No multi-host pod exists in this environment (one physical TPU chip), so
the run executes on the 8-virtual-device CPU mesh (2 data x 4 tile) built
by the same DCN-aware placement used for real pods
(parallel/multihost.make_hybrid_mesh) — demonstrating that the complete
pipeline (3DGS -> coarse SuGaR -> shell extraction -> frosting init ->
refine) runs end to end with sharded stage-1/2/5 steps, losses decreasing
and finite, and final eval PSNR recorded.

Writes PIPELINE_MC.json. Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/pipeline_multichip.py
"""

import json
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from frosting_tpu.extract.shell import ShellConfig, extract_shell
    from frosting_tpu.models import frosting as frosting_lib
    from frosting_tpu.parallel import multihost
    from frosting_tpu.parallel import sharded_frosting as sf
    from frosting_tpu.parallel import sharded_sugar as ssg
    from frosting_tpu.parallel import sharded_train as st
    from frosting_tpu.raster import RasterConfig, render
    from frosting_tpu.scene import synthetic
    from frosting_tpu.scene.gaussians import activate
    from frosting_tpu.train import frosting_trainer, gs_trainer, sugar_trainer
    from frosting_tpu.train import optimizer as opt_lib
    from frosting_tpu.ops.ssim import psnr as psnr_fn

    n_data, n_tile = 2, 4
    assert jax.device_count() >= n_data * n_tile, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    mesh = multihost.make_hybrid_mesh(n_data, n_tile)

    rcfg = RasterConfig(
        width=128, height=128, tile_w=32, tile_h=16, chunk=32,
        max_instances=1 << 15, backend="jax",
    )
    gt = synthetic.gaussian_blob_scene(n=3000, seed=0)
    cams = synthetic.camera_ring(n_cams=8, radius=3.0)
    eval_cams = synthetic.camera_ring(n_cams=3, radius=3.1, height=1.2)
    bg = jnp.zeros((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, bg)
    eval_imgs = synthetic.render_gt_images(gt, eval_cams, rcfg, bg)
    pts, cols = synthetic.degraded_init(gt, keep=0.7, jitter=0.05)

    result = {"mesh": f"{n_data}x{n_tile}", "stages": {}}
    t_start = time.time()

    def batches(rng, n_iters, bs):
        for _ in range(n_iters):
            yield rng.choice(len(cams), bs, replace=False)

    rng = np.random.default_rng(0)

    # --- stage 1: sharded 3DGS ---
    cfg1 = gs_trainer.GSTrainConfig(capacity=4096)
    state, tx1 = gs_trainer.init_state(pts, cols, 3.3, cfg1)
    step1 = st.make_sharded_train_step(tx1, rcfg, cfg1, mesh)
    losses = []
    for sel in batches(rng, 150, n_data):
        cb, gb = st.shard_batch(
            mesh,
            st.stack_cameras([cams[i] for i in sel]),
            jnp.asarray(gt_imgs[sel]),
        )
        state, m = step1(state, cb, gb)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    result["stages"]["gs_sharded"] = {
        "iters": len(losses),
        "loss_first": round(losses[0], 4),
        "loss_last": round(np.mean(losses[-10:]), 4),
    }
    print("stage 1 done", result["stages"]["gs_sharded"], flush=True)

    # --- stage 2: sharded coarse SuGaR (density regularization) ---
    cfg2 = sugar_trainer.SugarTrainConfig(
        method="density", n_sdf_samples=4096, knn_k=8, spatial_extent=3.3
    )
    tx2 = opt_lib.make_gs_optimizer(3.3)
    params2, opt2 = state.params, tx2.init(state.params)
    knn_idx = sugar_trainer.compute_knn(params2, cfg2.knn_k)
    steps2 = {
        ph: ssg.make_sharded_sugar_step(tx2, rcfg, cfg2, mesh, ph)
        for ph in ("entropy", "sdf")
    }
    key = jax.random.key(0)
    losses2 = []
    for it, sel in enumerate(batches(rng, 100, n_data)):
        ph = "entropy" if it < 40 else "sdf"
        if it % 25 == 0:
            knn_idx = sugar_trainer.compute_knn(params2, cfg2.knn_k)
        cb, gb = st.shard_batch(
            mesh,
            st.stack_cameras([cams[i] for i in sel]),
            jnp.asarray(gt_imgs[sel]),
        )
        key, sub = jax.random.split(key)
        params2, opt2, m = steps2[ph](params2, opt2, cb, gb, knn_idx, sub)
        losses2.append(float(m["loss"]))
    assert np.isfinite(losses2).all()
    result["stages"]["sugar_sharded"] = {
        "iters": len(losses2),
        "loss_last": round(np.mean(losses2[-10:]), 4),
    }
    print("stage 2 done", result["stages"]["sugar_sharded"], flush=True)

    # --- stage 3: shell extraction (host-driven, single device) ---
    live = np.asarray(params2.mask) > 0.5
    import dataclasses as dc

    p_live = type(params2)(
        **{
            f.name: jnp.asarray(np.asarray(getattr(params2, f.name))[live])
            for f in dc.fields(params2)
        }
    )
    means, scales, quats, opac, _sh = activate(p_live)
    verts, faces, _aux = extract_shell(
        means, scales, quats, opac, cams, rcfg,
        ShellConfig(poisson_resolution=64, target_vertices=2000, knn_k=8),
    )
    result["stages"]["shell"] = {
        "verts": int(np.asarray(verts).shape[0]),
        "faces": int(np.asarray(faces).shape[0]),
    }
    print("stage 3 done", result["stages"]["shell"], flush=True)

    # --- stage 4: frosting init (host-driven) ---
    fcfg = frosting_lib.FrostingConfig(
        n_gaussians=8192, knn_k=8, avoid_self_intersections=False
    )
    fparams, meta = frosting_lib.init_frosting(
        jax.random.key(1), verts, faces, means, scales, quats, opac,
        p_live, fcfg, 3.3,
    )
    result["stages"]["frosting_init"] = {
        "n_gaussians": int(fparams.bary_logits.shape[0])
    }
    print("stage 4 done", flush=True)

    # --- stage 5: sharded frosting refinement over the FULL
    # memory-scaling route: params + Adam state sharded over the
    # primitive axis (ZeRO-3) AND the all_to_all instance exchange
    # instead of the projected-set all-gather ---
    cfg5 = frosting_trainer.FrostingTrainConfig(
        iterations=150, lr_max_steps=150
    )
    tx5 = frosting_trainer.make_frosting_optimizer(cfg5, 3.3)
    fparams = sf.shard_frosting_params(mesh, fparams)
    opt5 = tx5.init(fparams)
    step5 = sf.make_sharded_frosting_step(
        tx5, rcfg, cfg5, mesh, meta,
        shard_params=True,
        primitive_exchange=True,
        exchange_cap=rcfg.max_instances // n_tile,
    )
    losses5 = []
    for sel in batches(rng, 150, n_data):
        cb, gb = st.shard_batch(
            mesh,
            st.stack_cameras([cams[i] for i in sel]),
            jnp.asarray(gt_imgs[sel]),
        )
        fparams, opt5, m = step5(fparams, opt5, cb, gb)
        losses5.append(float(m["loss"]))
    assert np.isfinite(losses5).all()
    n_chips = n_data * n_tile
    cap = fparams.bary_logits.shape[0]
    shard_rows = fparams.bary_logits.sharding.shard_shape(
        fparams.bary_logits.shape
    )[0]
    assert shard_rows == cap // n_chips, (shard_rows, cap)
    result["stages"]["refine_sharded"] = {
        "iters": len(losses5),
        "route": "sharded_params + primitive_exchange",
        "param_shard_rows_per_chip": shard_rows,
        "loss_first": round(losses5[0], 4),
        "loss_last": round(np.mean(losses5[-10:]), 4),
    }
    print("stage 5 done", result["stages"]["refine_sharded"], flush=True)

    # --- eval: single-device render of held-out views ---
    def render_eval(p, cam):
        g = frosting_lib.activate_frosting(p, meta)
        return render(*g, cam, rcfg, bg=bg).image

    fn = jax.jit(render_eval)
    psnrs = [
        float(
            psnr_fn(
                jnp.clip(fn(fparams, c), 0, 1), jnp.asarray(eval_imgs[i])
            )
        )
        for i, c in enumerate(eval_cams)
    ]
    result["eval_psnr"] = round(float(np.mean(psnrs)), 2)
    result["wall_clock_s"] = round(time.time() - t_start, 1)
    print(json.dumps(result))
    with open("PIPELINE_MC.json", "w") as fp:
        json.dump(result, fp, indent=1)


if __name__ == "__main__":
    main()
