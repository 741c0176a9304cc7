"""BASELINE gated config (4): frosting refinement at the reference's
2M-Gaussian budget (train.py:71, README.md:200) with occlusion culling
on one host, measuring the culled step's real compute saving
(refine.py:487-492; README.md:204 "decreases optimization time and
memory usage").

Builds a synthetic 2M-Gaussian frosting layer around a UV-sphere shell
(the step cost depends on instance counts and parameter sizes, not on
scene content), then times the FULL refine step vs the occlusion-CULLED
step at 1920x1080. Steps are dispatched one per call exactly as the
trainer does (params change every step, so the tunnel's same-input
memoization cannot fire; see PERF_NOTES.md); the device is synced once
per timed batch.

Writes REFINE2M.json. Run standalone (one TPU-compiling process at a time).
"""

import json
import time

import numpy as np


def uv_sphere(n_lat=100, n_lon=200, radius=1.0):
    """Closed UV sphere mesh (outward normals)."""
    lat = np.linspace(0, np.pi, n_lat + 1)[1:-1]
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    ll, tt = np.meshgrid(lon, lat)
    ring = np.stack(
        [np.sin(tt) * np.cos(ll), np.cos(tt), np.sin(tt) * np.sin(ll)], -1
    ).reshape(-1, 3)
    verts = np.concatenate(
        [[[0, 1, 0]], ring, [[0, -1, 0]]], axis=0
    ).astype(np.float32) * radius
    faces = []
    def vid(i, j):
        return 1 + i * n_lon + (j % n_lon)
    for j in range(n_lon):  # polar caps
        faces.append([0, vid(0, j), vid(0, j + 1)])
        faces.append([len(verts) - 1, vid(n_lat - 2, j + 1), vid(n_lat - 2, j)])
    for i in range(n_lat - 2):
        for j in range(n_lon):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            faces.append([a, b, d])
            faces.append([a, d, c])
    return verts, np.asarray(faces, np.int32)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--res", type=int, default=0, help="0 = 1920x1080")
    ap.add_argument(
        "--quality-iters", type=int, default=400,
        help="iters for the culled-vs-full QUALITY check (0 = skip)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (this env overrides JAX_PLATFORMS)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from frosting_tpu.models.frosting import FrostingMeta, FrostingParams
    from frosting_tpu.models import frosting as frosting_lib
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.raster.render import (
        autotune_max_instances,
        count_instances,
        render,
    )
    from frosting_tpu.scene.synthetic import camera_ring
    from frosting_tpu.train import frosting_trainer

    n = args.n
    verts, faces = uv_sphere() if n > 100_000 else uv_sphere(20, 40)
    f = len(faces)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    params = FrostingParams(
        shell_verts=jnp.asarray(verts),
        inner_dist=jnp.full((len(verts),), -0.02),
        outer_dist=jnp.full((len(verts),), 0.02),
        bary_logits=jnp.asarray(rng.normal(0, 0.7, (n, 6)), jnp.float32),
        scales_log=jnp.asarray(
            rng.uniform(np.log(0.002), np.log(0.006), (n, 3)), jnp.float32
        ),
        quats_raw=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        opacities_raw=jnp.asarray(rng.normal(1.0, 0.5, (n,)), jnp.float32),
        sh_dc=jnp.asarray(rng.normal(0.3, 0.2, (n, 1, 3)), jnp.float32),
        sh_rest=jnp.zeros((n, 15, 3), jnp.float32),
        bg=None,
    )
    cell_idx = np.sort(rng.integers(0, f, n)).astype(np.int32)
    meta = FrostingMeta(
        faces=jnp.asarray(faces),
        cell_idx=jnp.asarray(cell_idx),
        cell_bounds=jnp.asarray(
            np.searchsorted(cell_idx, np.arange(f + 1), "left").astype(
                np.int32
            )
        ),
    )

    w, h = (args.res, args.res) if args.res else (1920, 1080)
    cams = camera_ring(n_cams=4, radius=3.0)
    probe_cfg = RasterConfig(
        width=w, height=h, chunk=128, max_instances=1 << 23, backend="auto"
    )

    def probe(p, m, cam):
        g = frosting_lib.activate_frosting(p, m)
        return count_instances(*g, cam, probe_cfg)

    n_inst = max(
        int(jax.jit(probe)(params, meta, cam)) for cam in cams[:2]
    )
    rcfg = RasterConfig(
        width=w, height=h, chunk=128,
        max_instances=autotune_max_instances(n_inst, 128, safety=1.3),
        backend="auto",
    )
    print("instances", n_inst, "cap", rcfg.max_instances, flush=True)

    # GT = one clean render per camera of the initial model
    def render_gt(p, m, cam):
        g = frosting_lib.activate_frosting(p, m)
        return render(*g, cam, rcfg).image

    gt = [jax.jit(render_gt)(params, meta, c) for c in cams]

    tcfg = frosting_trainer.FrostingTrainConfig(
        iterations=1, use_occlusion_culling=True
    )
    tx = frosting_trainer.make_frosting_optimizer(tcfg, 3.0)
    opt_state = tx.init(params)

    vis = frosting_trainer.precompute_visibility(params, meta, cams, rcfg)
    vis_frac = float(vis[:, :n].mean())
    vis_masks = jax.device_put(jnp.asarray(vis))
    ones = jnp.ones((n,), jnp.float32)
    print(f"visible fraction {vis_frac:.3f}", flush=True)

    # the culled executable gets its own, smaller instance capacity: every
    # capacity-proportional cost (instance buffers, sorts, backward
    # reduction) shrinks with the visible subset, not just the blend. The
    # mask zeroes opacity and the opacity-aware rect cull emits zero
    # instances for masked gaussians (no param gathers).
    def probe_culled(p, m, mask, cam):
        me, sc, q, op, sh = frosting_lib.activate_frosting(p, m)
        return count_instances(me, sc, q, op * mask, sh, cam, probe_cfg)

    n_inst_c = max(
        int(jax.jit(probe_culled)(params, meta, vis_masks[i], cams[i]))
        for i in range(2)
    )
    rcfg_culled = RasterConfig(
        width=w, height=h, chunk=128,
        max_instances=autotune_max_instances(n_inst_c, 128, safety=1.3),
        backend="auto",
    )
    print("culled instances", n_inst_c, "cap", rcfg_culled.max_instances, flush=True)

    def run(step_fn, label, iters=12, warmup=3):
        # donated steps consume their inputs; run on copies of the seed
        p = jax.tree.map(jnp.copy, params)
        s = jax.tree.map(jnp.copy, opt_state)
        for i in range(warmup):
            p, s, aux = step_fn(p, s, i)
        jax.block_until_ready(p.bary_logits)
        t0 = time.time()
        for i in range(iters):
            p, s, aux = step_fn(p, s, i)
        jax.block_until_ready(p.bary_logits)
        dt = (time.time() - t0) / iters * 1e3
        loss = float(aux["loss"])
        assert np.isfinite(loss)
        print(f"{label}: {dt:.1f} ms/step (loss {loss:.4f})", flush=True)
        return dt

    # the trainer's hot loop donates params/opt_state (in-place updates);
    # measure that path
    def full_step(p, s, i):
        cam = cams[i % len(cams)]
        return frosting_trainer.frosting_train_step_donated(
            p, s, meta, cam, gt[i % len(cams)], ones, tx, rcfg, tcfg, 3
        )

    def culled_step(p, s, i):
        c = i % len(cams)
        return frosting_trainer.frosting_train_step_donated(
            p, s, meta, cams[c], gt[c], vis_masks[c],
            tx, rcfg_culled, tcfg, 3,
        )

    ms_full = run(full_step, "full")
    ms_culled = run(culled_step, "culled")

    # ---- QUALITY: the reference claims culling has "small quality
    # impact" (README.md:204). Perturb the model, train it back against
    # the clean GT renders with (a) full steps and (b) the reference's
    # every-2nd-iteration culling cadence (refine.py:487-492), and eval
    # PSNR on a HELD-OUT camera. ----
    quality = {}
    if args.quality_iters > 0:
        from frosting_tpu.ops.ssim import psnr as psnr_fn

        eval_cam = camera_ring(n_cams=8, radius=3.0)[1]  # between train views
        gt_eval = jax.jit(render_gt)(params, meta, eval_cam)

        k1, k2, k3 = jax.random.split(key, 3)
        import dataclasses as _dc

        p0 = _dc.replace(
            params,
            bary_logits=params.bary_logits
            + 0.5 * jax.random.normal(k1, params.bary_logits.shape),
            sh_dc=params.sh_dc
            + 0.08 * jax.random.normal(k2, params.sh_dc.shape),
            opacities_raw=params.opacities_raw
            + 0.4 * jax.random.normal(k3, params.opacities_raw.shape),
        )

        def eval_psnr(p):
            img = jnp.clip(jax.jit(render_gt)(p, meta, eval_cam), 0, 1)
            return float(psnr_fn(img, jnp.clip(gt_eval, 0, 1)))

        start_psnr = eval_psnr(p0)
        print(f"quality: perturbed start {start_psnr:.2f} dB", flush=True)

        def train_variant(use_culling):
            p = jax.tree.map(jnp.copy, p0)
            s = tx.init(p)
            t0 = time.time()
            for it in range(1, args.quality_iters + 1):
                c = it % len(cams)
                if use_culling and it % 2 == 0:
                    p, s, _ = frosting_trainer.frosting_train_step_donated(
                        p, s, meta, cams[c], gt[c], vis_masks[c],
                        tx, rcfg_culled, tcfg, 3,
                    )
                else:
                    p, s, _ = frosting_trainer.frosting_train_step_donated(
                        p, s, meta, cams[c], gt[c], ones, tx, rcfg, tcfg, 3
                    )
            jax.block_until_ready(p.bary_logits)
            wall = time.time() - t0
            return eval_psnr(p), wall

        psnr_full, wall_full = train_variant(False)
        print(f"quality full: {psnr_full:.2f} dB ({wall_full:.0f} s)", flush=True)
        psnr_culled, wall_culled = train_variant(True)
        print(
            f"quality culled: {psnr_culled:.2f} dB ({wall_culled:.0f} s)",
            flush=True,
        )
        quality = {
            "quality_iters": args.quality_iters,
            "start_psnr": round(start_psnr, 2),
            "eval_psnr_full": round(psnr_full, 2),
            "eval_psnr_culled": round(psnr_culled, 2),
            "culled_quality_delta_db": round(psnr_culled - psnr_full, 3),
            "quality_wall_s_full": round(wall_full, 1),
            "quality_wall_s_culled": round(wall_culled, 1),
        }

    result = {
        "metric": "frosting refine step, 2M gaussians, 1920x1080",
        "ms_per_step_full": round(ms_full, 1),
        "ms_per_step_culled": round(ms_culled, 1),
        "culled_speedup": round(ms_full / ms_culled, 3),
        "visible_fraction": round(vis_frac, 4),
        "instances": n_inst,
        "instances_culled": n_inst_c,
        "n_faces": f,
        "long_preset_15k_iters_minutes_culled": round(
            15000 * (ms_culled + ms_full) / 2 / 1e3 / 60, 1
        ),
        "reference": "refine.py:487-492 culls every 2nd iter; README.md:235 'up to 30 minutes' for the long preset",
        **quality,
    }
    print(json.dumps(result))
    with open("REFINE2M.json", "w") as fp:
        json.dump(result, fp, indent=1)


if __name__ == "__main__":
    main()
