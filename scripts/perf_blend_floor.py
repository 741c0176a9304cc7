"""Split the Pallas blend cost into per-program floor vs compute.

Runs the full fwd (and optionally fwdbwd) pipeline with opacity forced to
three regimes:
  opaque  (0.995): every tile early-exits after ~1 superblock -> floor
  bench   (as-is): the bench distribution
  clear   (0.02):  no early exit -> compute ceiling

    python scripts/perf_blend_floor.py [--tile 16] [--chunk 128] [--bwd]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--regimes", default="opaque,bench,clear")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig, render

    rng = np.random.default_rng(0)
    n = 100_000
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
        width=512, height=512, tile_w=args.tile, tile_h=args.tile,
        chunk=args.chunk, max_instances=1 << 20, backend="pallas",
    )
    target = jnp.zeros((3, 512, 512), jnp.float32)
    iters = args.iters
    regimes = {
        "opaque": lambda o, i, salt: jnp.clip(o * 0.0 + 0.995 + salt + 1e-5 * i, 0, 1),
        "bench": lambda o, i, salt: jnp.clip(o + 1e-4 * i + salt, 0, 1),
        "clear": lambda o, i, salt: jnp.clip(o * 0.0 + 0.02 + salt + 1e-5 * i, 0, 1),
    }

    results = {}
    for name in args.regimes.split(","):
        mod = regimes[name]

        if args.bwd:
            def loss(m, s, q, o, shh):
                out = render(m, s, q, o, shh, cam, cfg)
                return jnp.mean(jnp.abs(out.image - target))

            grad = jax.grad(loss, argnums=3)

            def f(g, salt, i, mod=mod):
                m, s, q, o, shh = g
                o = mod(o, i, salt)
                return jnp.sum(jnp.abs(grad(m, s, q, o, shh)))
        else:
            def f(g, salt, i, mod=mod):
                m, s, q, o, shh = g
                o = mod(o, i, salt)
                out = render(m, s, q, o, shh, cam, cfg)
                return jnp.sum(out.image) * 1e-9

        @jax.jit
        def prog(g, salt, f=f):
            def body(i, acc):
                return acc + f(g, salt, i.astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, 0.0)

        r = float(prog(gs, 0.0))
        t0 = time.time()
        r = float(prog(gs, 0.0171))
        dt = time.time() - t0
        assert np.isfinite(r)
        results[name] = round(dt / iters * 1e3, 2)
        print(json.dumps({name: results[name]}), flush=True)
    print(
        json.dumps(
            {"tile": args.tile, "chunk": args.chunk, "bwd": args.bwd, **results}
        )
    )


if __name__ == "__main__":
    main()
