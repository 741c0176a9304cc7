"""Stage-level timing of the 2M-gaussian frosting REFINE step (the
BASELINE config-4 shape: 1920x1080, occlusion-culled cap) — where does
the 632 ms go?

Cumulative in-program pipelines, each its own jit + fori_loop + salt
(PERF_NOTES methodology):
  act      — frosting activation only (softmax-bary x corner gather)
  pre      — + preprocess (project/EWA/SH at 2M)
  fwd      — full render forward
  fwdbwd   — + loss + full backward (corner prefix-diff, sorts, segsum)
  step     — + Adam update (the trainer's full step)

Run standalone on the chip: python scripts/perf_refine_stages.py
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from bench_refine2m import uv_sphere  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--culled", action="store_true",
                    help="use the culled instance cap (visible subset)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dispatch", action="store_true",
                    help="time per-dispatch jitted calls instead of an "
                    "in-program fori_loop (the fori composition trips the "
                    "round-5 TPU-worker fault at 2M shapes; dispatched "
                    "steps are ~600 ms so ~1 ms dispatch overhead is noise)")
    ap.add_argument("--res", type=int, default=0, help="0 = 1920x1080")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from frosting_tpu.models.frosting import FrostingMeta, FrostingParams
    from frosting_tpu.models import frosting as frosting_lib
    from frosting_tpu.ops.ssim import l1_loss, ssim
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.raster.preprocess import preprocess
    from frosting_tpu.raster.render import (
        autotune_max_instances,
        count_instances,
        render,
    )
    from frosting_tpu.scene.synthetic import camera_ring
    from frosting_tpu.train import frosting_trainer

    n = args.n
    verts, faces = uv_sphere()
    f = len(faces)
    rng = np.random.default_rng(0)
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
    cam = camera_ring(n_cams=4, radius=3.0)[0]
    probe_cfg = RasterConfig(
        width=w, height=h, chunk=128, max_instances=1 << 23, backend="auto"
    )

    vis_mask = jnp.ones((n,), jnp.float32)
    if args.culled:
        tcfg0 = frosting_trainer.FrostingTrainConfig(
            iterations=1, use_occlusion_culling=True
        )
        vis = frosting_trainer.precompute_visibility(
            params, meta, [cam], probe_cfg
        )
        vis_mask = jnp.asarray(vis[0], jnp.float32)

    def probe(p, m, mask):
        me, sc, q, op, sh = frosting_lib.activate_frosting(p, m)
        return count_instances(me, sc, q, op * mask, sh, cam, probe_cfg)

    n_inst = int(jax.jit(probe)(params, meta, vis_mask))
    rcfg = RasterConfig(
        width=w, height=h, chunk=128,
        max_instances=autotune_max_instances(n_inst, 128, safety=1.3),
        backend="auto",
    )
    print(f"instances {n_inst} cap {rcfg.max_instances}", flush=True)

    gt = jax.jit(
        lambda p, m: render(
            *frosting_lib.activate_frosting(p, m), cam, rcfg
        ).image
    )(params, meta)

    tcfg = frosting_trainer.FrostingTrainConfig(iterations=1)
    tx = frosting_trainer.make_frosting_optimizer(tcfg, 3.0)
    opt_state = tx.init(params)

    import dataclasses

    def salt(p, s):
        return dataclasses.replace(
            p, opacities_raw=p.opacities_raw + s * 1e-4
        )

    def loop(body):
        def run(p, s0):
            def it(i, carry):
                p, acc = carry
                p2 = salt(p, s0 + jnp.float32(i) * 1e-3)
                acc = acc + body(p2)
                return (p, acc)

            _, acc = jax.lax.fori_loop(0, args.iters, it, (p, jnp.float32(0)))
            return acc

        return jax.jit(run)

    def act_body(p):
        me, sc, q, op, sh = frosting_lib.activate_frosting(p, meta)
        return me.sum() + sc.sum() + q.sum() + op.sum() + sh[:, 0].sum()

    def pre_body(p):
        me, sc, q, op, sh = frosting_lib.activate_frosting(p, meta)
        proj = preprocess(me, sc, q, op * vis_mask, sh, cam, rcfg)
        return (
            proj.means2d.sum()
            + proj.conics.sum()
            + proj.colors.sum()
            + jnp.float32(proj.radii.sum())
        )

    def fwd_body(p):
        me, sc, q, op, sh = frosting_lib.activate_frosting(p, meta)
        return render(me, sc, q, op * vis_mask, sh, cam, rcfg).image.sum()

    def loss_of(p):
        me, sc, q, op, sh = frosting_lib.activate_frosting(p, meta)
        img = render(me, sc, q, op * vis_mask, sh, cam, rcfg).image
        return (1 - 0.2) * l1_loss(img, gt) + 0.2 * (1 - ssim(img, gt))

    def bwd_body(p):
        l, g = jax.value_and_grad(loss_of)(p)
        return l + g.bary_logits.sum() + g.sh_dc.sum()

    results = {}
    stages = [
        ("act", act_body),
        ("pre", pre_body),
        ("fwd", fwd_body),
        ("fwdbwd", bwd_body),
    ]
    for name, body in stages:
        if args.dispatch:
            fn1 = jax.jit(lambda p, s, _b=body: _b(salt(p, s)))
            r = float(fn1(params, 0.0))  # compile
            best = float("inf")
            for rep in range(3):
                t0 = time.time()
                for i in range(args.iters):
                    r = float(fn1(params, 0.01 + 1e-3 * (i + rep)))
                best = min(best, time.time() - t0)
        else:
            fn = loop(body)
            r = float(fn(params, 0.0))  # compile
            best = float("inf")
            for rep in range(3):
                t0 = time.time()
                r = float(fn(params, 0.01 + 0.003 * rep))
                best = min(best, time.time() - t0)
        ms = best / args.iters * 1e3
        results[name] = round(ms, 1)
        print(f"{name}: {ms:.1f} ms", flush=True)

    # full train step (per-dispatch, like the trainer; includes Adam;
    # donated = the trainer's in-place hot path)
    ones = vis_mask
    p = jax.tree.map(jnp.copy, params)
    s = tx.init(p)
    for i in range(3):
        p, s, aux = frosting_trainer.frosting_train_step_donated(
            p, s, meta, cam, gt, ones, tx, rcfg, tcfg, 3
        )
    jax.block_until_ready(p.bary_logits)
    t0 = time.time()
    iters = max(5, args.iters)
    for i in range(iters):
        p, s, aux = frosting_trainer.frosting_train_step_donated(
            p, s, meta, cam, gt, ones, tx, rcfg, tcfg, 3
        )
    jax.block_until_ready(p.bary_logits)
    results["step_dispatched"] = round((time.time() - t0) / iters * 1e3, 1)
    print(f"step_dispatched: {results['step_dispatched']} ms", flush=True)

    out = {
        "shape": f"{n} gaussians, {w}x{h}, cap {rcfg.max_instances}",
        "culled": bool(args.culled),
        "instances": n_inst,
        "iters": args.iters,
        "stage_ms": results,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(out, fp, indent=1)


if __name__ == "__main__":
    main()
