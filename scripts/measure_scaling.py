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


def fabricate_frosting(n_gauss: int, n_verts: int = 2048):
    """Synthetic FrostingParams/Meta at a given budget (no extraction/init
    pass needed for a compile-memory measurement)."""
    import jax.numpy as jnp

    from frosting_tpu.models.frosting import FrostingMeta, FrostingParams

    rng = np.random.default_rng(0)
    v = rng.normal(size=(n_verts, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    n_faces = 2 * n_verts - 4
    faces = rng.integers(0, n_verts, (n_faces, 3)).astype(np.int32)
    params = FrostingParams(
        shell_verts=jnp.asarray(v),
        inner_dist=jnp.full((n_verts,), -0.02),
        outer_dist=jnp.full((n_verts,), 0.05),
        bary_logits=jnp.zeros((n_gauss, 6)),
        scales_log=jnp.full((n_gauss, 3), -4.0),
        quats_raw=jnp.concatenate(
            [jnp.ones((n_gauss, 1)), jnp.zeros((n_gauss, 3))], 1
        ),
        opacities_raw=jnp.zeros((n_gauss,)),
        sh_dc=jnp.zeros((n_gauss, 1, 3)),
        sh_rest=jnp.zeros((n_gauss, 15, 3)),
    )
    meta = FrostingMeta(
        faces=jnp.asarray(faces),
        cell_idx=jnp.asarray(
            rng.integers(0, n_faces, n_gauss).astype(np.int32)
        ),
    )
    return params, meta


def memory_columns(n_devices: int, n_gauss: int = 1 << 22) -> dict:
    """Per-chip compiled-memory of the refine step at a 1M-gaussian budget:
    all-gather route vs all_to_all exchange route. XLA's memory_analysis is
    per-device and backend-independent, so the virtual CPU mesh measures
    exactly the quantity that matters on a pod: whether per-chip temp
    memory scales with N (gather) or with N/n_tile + exchange capacity."""
    from frosting_tpu.parallel import sharded_frosting as sf
    from frosting_tpu.parallel import sharded_train as st
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.scene import synthetic
    from frosting_tpu.train import frosting_trainer

    n_tile = n_devices
    # modest instance cap so the O(N)-vs-O(N/n_tile) projected-set term
    # (the thing gather vs exchange changes) is not buried under cap-sized
    # binning buffers
    rcfg = RasterConfig(
        width=256, height=256, tile_w=32, tile_h=32, chunk=64,
        max_instances=1 << 20, backend="jax",
    )
    mesh = st.make_mesh(n_data=1, n_tile=n_tile)
    fparams, meta = fabricate_frosting(n_gauss)
    tcfg = frosting_trainer.FrostingTrainConfig(iterations=1)
    tx = frosting_trainer.make_frosting_optimizer(tcfg, 3.5)
    opt_state = tx.init(fparams)
    cams = synthetic.camera_ring(n_cams=1, radius=3.0)
    gt = jnp.zeros((1, 3, 256, 256), jnp.float32)
    cams_s, gts_s = st.shard_batch(mesh, st.stack_cameras(cams), gt)

    row = {"devices": n_devices, "n_gaussians": n_gauss,
           "exchange_rows_held": None}
    # per-(sender,receiver) capacity: ~uniform share N/n_tile^2 with 4x
    # slack (each gaussian's rect typically overlaps 1-2 strips); the
    # receiver then holds n_tile*cap_pair = 4N/n_tile rows instead of the
    # gather route's N — THAT is the per-chip memory scaling being measured
    cap_pair = max(4096, 4 * n_gauss // (n_tile * n_tile))
    row["exchange_rows_held"] = n_tile * cap_pair
    # sharded-params placement: each chip owns n_gauss/n_devices rows of
    # params AND Adam moments -> argument_MB must fall ~1/n_devices
    fparams_sh = sf.shard_frosting_params(mesh, fparams)
    opt_state_sh = tx.init(fparams_sh)
    for tag, p, o, kwargs in (
        ("gather", fparams, opt_state, {}),
        ("exchange", fparams, opt_state,
         {"primitive_exchange": True, "exchange_cap": cap_pair}),
        ("sharded_params", fparams_sh, opt_state_sh,
         {"shard_params": True}),
        ("sharded_params_exchange", fparams_sh, opt_state_sh,
         {"shard_params": True, "primitive_exchange": True,
          "exchange_cap": cap_pair}),
    ):
        step = sf.make_sharded_frosting_step(
            tx, rcfg, tcfg, mesh, meta, **kwargs
        )
        compiled = step.lower(p, o, cams_s, gts_s).compile()
        ma = compiled.memory_analysis()
        row[tag] = {
            "temp_MB": round(ma.temp_size_in_bytes / 2**20, 1),
            "argument_MB": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_MB": round(ma.output_size_in_bytes / 2**20, 1),
        }
        print("memory", n_devices, tag, row[tag], flush=True)
    return row


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
    # per-chip compiled memory at a 1M-gaussian refine: gather vs exchange
    out["refine_memory_1m"] = [
        memory_columns(nd) for nd in (1, 4, 8) if nd <= jax.device_count()
    ]
    with open("SCALING.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
