"""Repro #3: instrumented entropy->sdf transition on the solid object
scene. Caches the GS warm-start in /tmp so reruns skip stage 1, then runs
the sugar schedule with per-iteration probes (param finiteness, opacity
stats, instance counts, grad norms) around the entropy window and the
hard prune.

  PYTHONPATH="$PWD:$PYTHONPATH" python -u scripts/debug_sugar_sdf3.py
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

from benchmark_shelly import make_object_scene  # noqa: E402

CACHE = "/tmp/sdf3_gs_state.npz"


def main():
    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig, render
    from frosting_tpu.scene import synthetic
    from frosting_tpu.scene.gaussians import GaussianParams, activate
    from frosting_tpu.train import gs_trainer, sugar_trainer

    res = 256
    rcfg = RasterConfig(
        width=res, height=res, chunk=128,
        max_instances=1 << 19, backend="auto",
    )
    gt_gs = make_object_scene(n_surface=8000, n_interior=3000)
    cams = []
    for ring, (radius, height) in enumerate(((2.7, 0.9), (2.3, 1.8))):
        for i in range(8):
            a = 2 * math.pi * (i + 0.33 * ring) / 8
            cams.append(
                look_at_camera(
                    eye=[radius * math.cos(a), radius * math.sin(a), height],
                    target=[0.0, 0.0, 0.0], up=(0, 0, 1),
                    fov_x=math.radians(50),
                )
            )
    white = jnp.ones((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt_gs, cams, rcfg, white)

    if os.path.exists(CACHE):
        import dataclasses

        d = np.load(CACHE)
        params = GaussianParams(
            **{f.name: jnp.asarray(d[f.name])
               for f in dataclasses.fields(GaussianParams)}
        )
        print("loaded cached GS state", flush=True)
    else:
        rng = np.random.default_rng(1)
        n_pts = 3000
        sub = rng.choice(len(gt_gs[0]), n_pts, replace=False)
        points = np.asarray(gt_gs[0])[sub] + rng.normal(
            scale=0.01, size=(n_pts, 3)
        )
        colors = np.full((n_pts, 3), 0.5, np.float32)
        gcfg = gs_trainer.GSTrainConfig(
            iterations=1200, white_background=True, capacity=1 << 15,
            densify_until=1020, opacity_reset_interval=1500, log_every=200,
        )
        state, _ = gs_trainer.train(
            cams, np.asarray(gt_imgs), points, colors, 2.0, rcfg, gcfg
        )
        params = state.params
        import dataclasses

        np.savez(
            CACHE,
            **{f.name: np.asarray(getattr(params, f.name))
               for f in dataclasses.fields(GaussianParams)},
        )
        print("cached GS state", flush=True)

    # ---- instrumented sugar run ----
    import dataclasses

    scfg = sugar_trainer.SugarTrainConfig(
        iterations=2200, start_iteration=1200, method="density",
        entropy_from=1200, entropy_until=1650,
        regularize_from=1200, sdf_from=1650, hard_prune_at=1700,
        white_background=True, sdf_estimation_factor=0.2,
        sdf_better_normal_factor=0.2, n_sdf_samples=50_000, log_every=50,
    )

    def probe(tag, p):
        m, s, q, o, sh = activate(p)
        live = np.asarray(p.mask) > 0.5
        on = np.asarray(o)[live]
        finite = {
            f.name: bool(np.isfinite(np.asarray(getattr(p, f.name))).all())
            for f in dataclasses.fields(GaussianParams)
        }
        bad = [k for k, v in finite.items() if not v]
        out = render(m, s, q, o, sh, cams[0], rcfg, bg=white)
        img = np.asarray(out.image)
        print(
            f"[probe {tag}] live={live.sum()} op[med={np.median(on):.3f} "
            f"frac>.5={(on > 0.5).mean():.3f} frac<.01={(on < 0.01).mean():.3f}] "
            f"inst={int(out.num_instances)} img[min={img.min():.3g} "
            f"max={img.max():.3g} finite={np.isfinite(img).all()}] "
            f"nonfinite_params={bad}",
            flush=True,
        )
        # live-row finiteness per field
        for f in dataclasses.fields(GaussianParams):
            arr = np.asarray(getattr(p, f.name))
            arr_live = arr[live] if arr.shape[0] == live.shape[0] else arr
            if not np.isfinite(arr_live).all():
                n_bad = (~np.isfinite(arr_live).reshape(len(arr_live), -1)
                         .all(1)).sum()
                print(f"    LIVE-ROW NONFINITE {f.name}: {n_bad} rows",
                      flush=True)

    probe("pre-sugar", params)

    # run via the trainer but intercept with a custom log: simplest is to
    # re-drive the loop here (copy of sugar_trainer.train with probes)
    import optax  # noqa: F401

    from frosting_tpu.train import optimizer as opt_lib

    tx = opt_lib.make_gs_optimizer(2.0)
    opt_state = tx.init(params)
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    gt_dev = jax.device_put(jnp.asarray(gt_imgs))
    knn_idx = sugar_trainer.compute_knn(params, scfg.knn_k)

    order = rng.permutation(len(cams))
    pos = 0
    for it in range(scfg.start_iteration, scfg.iterations + 1):
        if pos >= len(order):
            order = rng.permutation(len(cams))
            pos = 0
        ci = int(order[pos])
        pos += 1
        if it > scfg.regularize_from and it % scfg.reset_neighbors_every == 0:
            knn_idx = sugar_trainer.compute_knn(params, scfg.knn_k)
        if it == scfg.hard_prune_at:
            probe("pre-prune", params)
            params = sugar_trainer.hard_prune(
                params, scfg.hard_prune_threshold
            )
            probe("post-prune", params)
            knn_idx = sugar_trainer.compute_knn(params, scfg.knn_k)
        if scfg.entropy_from < it < scfg.entropy_until:
            phase = "entropy"
        elif it > scfg.sdf_from:
            phase = "sdf"
        else:
            phase = "photo"
        key, sub = jax.random.split(key)
        params, opt_state, aux = sugar_trainer.sugar_train_step(
            params, opt_state, cams[ci], gt_dev[ci], knn_idx, sub,
            tx, rcfg, scfg, scfg.sh_degree, phase,
        )
        loss = float(aux["loss"])
        if (
            it % scfg.log_every == 0
            or not np.isfinite(loss)
            or (1645 <= it <= 1730)
        ):
            print(
                f"[sugar] it {it} [{phase}] loss {loss:.4f} "
                f"psnr {float(aux['psnr']):.2f}",
                flush=True,
            )
        if it in (1300, 1645, 1651, 1655, 1660, 1680, 1699, 1701, 1705,
                  1750, 1900, 2100) or (
            not np.isfinite(loss) and it % 37 == 0
        ):
            probe(f"it{it}", params)


if __name__ == "__main__":
    main()
