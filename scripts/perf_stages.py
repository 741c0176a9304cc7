"""Stage-level timing of the full differentiable render on TPU.

Times cumulative pipelines (each its own jit + in-program loop + salt):
  preprocess | +bin | +take | +blocklayout | full fwd | full fwdbwd
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--tile-h", type=int, default=0, help="0 = square tile")
    ap.add_argument("--autotune", action="store_true",
                    help="autotune max_instances like bench.py")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--stages",
        default="pre,bin,take,layout,fwd,fwdbwd",
        help="comma list",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig, render
    from frosting_tpu.raster import blend_pallas
    from frosting_tpu.raster.binning import bin_gaussians
    from frosting_tpu.raster.preprocess import pack_fields, preprocess

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
    tile_h = args.tile_h or args.tile
    cap = 1 << 20
    if args.autotune:
        from frosting_tpu.raster.render import (
            autotune_max_instances,
            count_instances,
        )

        probe_cfg = RasterConfig(
            width=512, height=512, tile_w=args.tile, tile_h=tile_h,
            chunk=args.chunk, max_instances=1 << 21, backend="auto",
        )
        n_inst = int(
            jax.jit(lambda g, c: count_instances(*g, c, probe_cfg))(gs, cam)
        )
        cap = autotune_max_instances(n_inst, args.chunk, safety=1.25)
        print(json.dumps({"n_inst": n_inst, "cap": cap}), flush=True)
    cfg = RasterConfig(
        width=512, height=512, tile_w=args.tile, tile_h=tile_h,
        chunk=args.chunk, max_instances=cap, backend="pallas",
    )
    target = jnp.zeros((3, 512, 512), jnp.float32)
    iters = args.iters

    def stage_fn(name):
        def pre(g, salt, i):
            m, s, q, o, shh = g
            o = jnp.clip(o + 1e-4 * i + salt, 0, 1)
            return preprocess(m, s, q, o, shh, cam, cfg)

        if name == "pre":
            def f(g, salt, i):
                p = pre(g, salt, i)
                return jnp.sum(p.means2d) * 1e-9 + jnp.sum(p.depths) * 1e-9
        elif name == "bin":
            def f(g, salt, i):
                p = pre(g, salt, i)
                b = bin_gaussians(p.rect, p.depths, p.valid, cfg)
                return jnp.sum(b.tile_nchunks).astype(jnp.float32) * 1e-9
        elif name == "take":
            # the REAL pallas-path gather (lane-compact transposed take +
            # block-layout reshape, render._gather_padded)
            from frosting_tpu.raster.render import _gather_padded

            def f(g, salt, i):
                p = pre(g, salt, i)
                b = bin_gaussians(p.rect, p.depths, p.valid, cfg)
                fe = pack_fields(p)
                p3 = _gather_padded(fe, b, cfg)
                return jnp.sum(p3[:, 0, 0]) * 1e-9
        elif name == "layout":
            # flat-row gather + relayout (the jax-backend path; kept for
            # comparison against `take`)
            def f(g, salt, i):
                p = pre(g, salt, i)
                b = bin_gaussians(p.rect, p.depths, p.valid, cfg)
                fe = pack_fields(p)  # [W, N+1] lane-compact
                padded = jnp.take(fe.T, b.padded_gauss, axis=0)
                p3 = blend_pallas.to_block_layout(padded, cfg)
                return jnp.sum(p3[:, 0, 0]) * 1e-9
        elif name == "fwd":
            def f(g, salt, i):
                m, s, q, o, shh = g
                o = jnp.clip(o + 1e-4 * i + salt, 0, 1)
                out = render(m, s, q, o, shh, cam, cfg)
                return jnp.sum(out.image) * 1e-9
        elif name == "fwdbwd":
            def loss(m, s, q, o, shh):
                out = render(m, s, q, o, shh, cam, cfg)
                return jnp.mean(jnp.abs(out.image - target))

            grad = jax.grad(loss, argnums=3)

            def f(g, salt, i):
                m, s, q, o, shh = g
                o = jnp.clip(o + 1e-4 * i + salt, 0, 1)
                return jnp.sum(jnp.abs(grad(m, s, q, o, shh)))
        return f

    results = {}
    for name in args.stages.split(","):
        f = stage_fn(name)

        @jax.jit
        def prog(g, salt):
            def body(i, acc):
                return acc + f(g, salt, i.astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, 0.0)

        r = float(prog(gs, 0.0))
        t0 = time.time()
        r = float(prog(gs, 0.017))
        dt = time.time() - t0
        assert np.isfinite(r)
        results[name] = round(dt / iters * 1e3, 2)
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"chunk": args.chunk, "tile": args.tile, **results}))


if __name__ == "__main__":
    main()
