"""Measure sharded-step scaling: pixels/s vs device count on the virtual
CPU mesh, written to SCALING.json.

CAVEAT: virtual devices share one host's cores, so ABSOLUTE numbers and
perfect-linear expectations do not transfer to a real pod; what this
records is (a) that the sharded step runs at every mesh size and (b) the
relative overhead introduced by the collectives in the step (all_gather of
the projected set + grad psum). Run with:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/measure_scaling.py
"""

import dataclasses
import json
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def time_step(n_devices: int, which: str, iters: int = 8) -> dict:
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.scene import synthetic
    from frosting_tpu.parallel import sharded_train as st

    n_tile = n_devices  # scale the image-strip axis (tile+primitive)
    rcfg = RasterConfig(
        width=256, height=256, tile_w=32, tile_h=32, chunk=64,
        max_instances=1 << 16, backend="jax",
    )
    gt = synthetic.gaussian_blob_scene(n=4096, seed=0)
    cams = synthetic.camera_ring(n_cams=1, radius=3.0)
    bg = jnp.zeros((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, bg)
    mesh = st.make_mesh(n_data=1, n_tile=n_tile)

    if which == "gs":
        from frosting_tpu.train import gs_trainer

        pts, cols = synthetic.degraded_init(gt, keep=0.9, jitter=0.02)
        cfg = gs_trainer.GSTrainConfig(capacity=8192)
        state, tx = gs_trainer.init_state(pts, cols, 3.3, cfg)
        step = st.make_sharded_train_step(tx, rcfg, cfg, mesh)
        cams_s, gts_s = st.shard_batch(
            mesh, st.stack_cameras(cams), jnp.asarray(gt_imgs)
        )
        state, m = step(state, cams_s, gts_s)  # compile
        jax.block_until_ready(m)
        t0 = time.time()
        for _ in range(iters):
            state, m = step(state, cams_s, gts_s)
        jax.block_until_ready(m)
        dt = (time.time() - t0) / iters
    else:
        from frosting_tpu.extract.shell import ShellConfig, extract_shell
        from frosting_tpu.models import frosting as frosting_lib
        from frosting_tpu.parallel import sharded_frosting as sf
        from frosting_tpu.train import frosting_trainer

        verts, faces, _aux = extract_shell(
            gt[0], gt[1], gt[2], gt[3], cams, rcfg,
            ShellConfig(poisson_resolution=48, target_vertices=600, knn_k=8),
        )
        fcfg = frosting_lib.FrostingConfig(
            n_gaussians=16384, knn_k=8, avoid_self_intersections=False
        )
        fparams, meta = frosting_lib.init_frosting(
            jax.random.key(0), verts, faces, gt[0], gt[1], gt[2], gt[3],
            None, fcfg, 3.5,
        )
        tcfg = frosting_trainer.FrostingTrainConfig(iterations=1)
        tx = frosting_trainer.make_frosting_optimizer(tcfg, 3.5)
        opt_state = tx.init(fparams)
        step = sf.make_sharded_frosting_step(tx, rcfg, tcfg, mesh, meta)
        cams_s, gts_s = st.shard_batch(
            mesh, st.stack_cameras(cams), jnp.asarray(gt_imgs)
        )
        fparams2, opt_state, m = step(fparams, opt_state, cams_s, gts_s)
        jax.block_until_ready(m)
        t0 = time.time()
        for _ in range(iters):
            fparams2, opt_state, m = step(fparams2, opt_state, cams_s, gts_s)
        jax.block_until_ready(m)
        dt = (time.time() - t0) / iters

    pix_s = 256 * 256 / dt
    return {"devices": n_devices, "ms_per_step": round(dt * 1e3, 1),
            "pix_per_s": round(pix_s)}


def main():
    out = {"note": "virtual CPU mesh (one host) — relative overhead only"}
    for which in ("gs", "refine"):
        rows = []
        for nd in (1, 2, 4, 8):
            if nd > jax.device_count():
                break
            rows.append(time_step(nd, which))
            print(which, rows[-1], flush=True)
        base = rows[0]["pix_per_s"]
        for r in rows:
            r["efficiency_vs_1dev"] = round(r["pix_per_s"] / base, 3)
        out[which] = rows
    with open("SCALING.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
