"""Perf probe: vary RasterConfig knobs and report fwd / fwd+bwd step time.

Methodology follows PERF_NOTES.md (in-program fori_loop + on-device input
perturbation, one dispatch per measurement). One (config, mode) per process
invocation keeps remote compiles isolated:

    python scripts/perf_probe.py --chunk 128 --max-instances 1048576 --mode fwdbwd
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--tile-h", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--max-instances", type=int, default=1 << 20)
    ap.add_argument("--autotune-cap", action="store_true")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--mode", choices=["fwd", "fwdbwd"], default="fwdbwd")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig, render

    rng = np.random.default_rng(0)
    n = args.n
    means = rng.uniform(-0.7, 0.7, (n, 3))
    scales = np.exp(rng.uniform(np.log(0.008), np.log(0.04), (n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n)
    sh = rng.normal(size=(n, 16, 3)) * 0.2
    sh[:, 0] = (means + 1.0) * 0.7
    gs = tuple(
        jnp.asarray(a, jnp.float32) for a in (means, scales, quats, opac, sh)
    )
    cam = look_at_camera(eye=[0.0, 0.0, -3.0], target=[0.0, 0.0, 0.0])
    cfg = RasterConfig(
        width=args.width,
        height=args.height,
        tile_w=args.tile,
        tile_h=args.tile_h or args.tile,
        chunk=args.chunk,
        max_instances=args.max_instances,
        backend="auto",
    )
    if args.autotune_cap:
        from frosting_tpu.raster.render import (
            autotune_max_instances,
            count_instances,
        )

        n_inst = int(
            jax.jit(lambda g, c: count_instances(*g, c, cfg))(gs, cam)
        )
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg, max_instances=autotune_max_instances(n_inst, args.chunk)
        )
    target = jnp.zeros((3, args.height, args.width), jnp.float32)
    iters = args.iters

    def loss_fn(means, scales, quats, opac, sh, camera, tgt):
        out = render(means, scales, quats, opac, sh, camera, cfg)
        return jnp.mean(jnp.abs(out.image - tgt)), out.num_instances

    grad_opac = jax.grad(loss_fn, argnums=3, has_aux=True)

    @jax.jit
    def prog_fwdbwd(means, scales, quats, opac, sh, camera, tgt, salt):
        def body(i, carry):
            acc, ni = carry
            opac_i = jnp.clip(opac + 0.001 * i.astype(jnp.float32) + salt, 0, 1)
            g, num = grad_opac(means, scales, quats, opac_i, sh, camera, tgt)
            return acc + jnp.sum(jnp.abs(g)), num

        return jax.lax.fori_loop(0, iters, body, (0.0, jnp.int32(0)))

    @jax.jit
    def prog_fwd(means, scales, quats, opac, sh, camera, tgt, salt):
        def body(i, carry):
            acc, ni = carry
            opac_i = jnp.clip(opac + 0.001 * i.astype(jnp.float32) + salt, 0, 1)
            out = render(means, scales, quats, opac_i, sh, camera, cfg)
            return acc + jnp.sum(out.image), out.num_instances

        return jax.lax.fori_loop(0, iters, body, (0.0, jnp.int32(0)))

    prog = prog_fwd if args.mode == "fwd" else prog_fwdbwd
    r, ni = prog(*gs, cam, target, 0.0)
    r = float(r)
    t0 = time.time()
    r2, ni = prog(*gs, cam, target, 0.017)
    r2 = float(r2)  # blocks: sync must be inside the timed window
    dt = time.time() - t0
    assert np.isfinite(r2)
    mpix = args.width * args.height * iters / dt / 1e6
    print(
        json.dumps(
            {
                "mode": args.mode,
                "tile": [cfg.tile_w, cfg.tile_h],
                "chunk": args.chunk,
                "max_instances": args.max_instances,
                "num_instances": int(ni),
                "work_cap": cfg.work_cap,
                "ms_per_iter": round(dt / iters * 1e3, 2),
                "mpix_s": round(mpix, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
