"""Probe TPU physical-layout costs of small-minor-dim arrays.

Hypothesis (round 4): [N,3]/[N,4]/[N,16,3] arrays lane-pad their minor
dim to 128 in HBM, so merely READING the SH table ([N,16,3] -> physical
[N,16,128], 42x inflation) costs ~1 ms at N=100k and dominates
preprocess. If true, repacking SH as [N,48] (2.7x pad) or [48,N] (exact)
is a structural win for every training stage.

Modes:
  readsum  — time a salted fori_loop that reduces each candidate buffer
  mem      — compiled memory_analysis of a trivial consumer per layout
             (argument bytes reveal physical padding without timing)
  pre      — time preprocess with ALL outputs consumed, vs a variant fed
             the same SH data reshaped [N,48] ahead of time

Usage: python scripts/perf_layout_probe.py --mode readsum,mem,pre
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--mode", default="mem,readsum,pre")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = args.n
    iters = args.iters

    shapes = {
        "n3": (n, 3),
        "3n": (3, n),
        "n4": (n, 4),
        "n16x3": (n, 16, 3),
        "n48": (n, 48),
        "48n": (48, n),
        "n128": (n, 128),
    }
    bufs = {
        k: jnp.asarray(rng.normal(size=s), jnp.float32)
        for k, s in shapes.items()
    }

    modes = args.mode.split(",")

    if "mem" in modes:
        out = {}
        for k, b in bufs.items():
            # consumer that cannot DCE the argument
            f = jax.jit(lambda x: jnp.sum(x * 1.0000001))
            m = f.lower(b).compile().memory_analysis()
            if m is not None:
                out[k] = {
                    "logical_mb": round(b.size * 4 / 1e6, 2),
                    "arg_mb": round(m.argument_size_in_bytes / 1e6, 2),
                }
        print(json.dumps({"mem": out}), flush=True)

    if "readsum" in modes:
        out = {}
        for k, b in bufs.items():

            @jax.jit
            def prog(x, salt):
                def body(i, acc):
                    return acc + jnp.sum(x) * salt * (i + 1).astype(
                        jnp.float32
                    )

                return jax.lax.fori_loop(0, iters, body, 0.0)

            r = float(prog(b, 1e-9))
            t0 = time.time()
            r = float(prog(b, 1.1e-9))
            dt = (time.time() - t0) / iters * 1e3
            assert np.isfinite(r)
            out[k] = round(dt, 3)
        print(json.dumps({"readsum_ms": out}), flush=True)

    if "pre" in modes:
        from frosting_tpu.cameras import look_at_camera
        from frosting_tpu.ops import sh as sh_ops
        from frosting_tpu.raster import RasterConfig
        from frosting_tpu.raster.preprocess import pack_fields, preprocess

        means = rng.uniform(-0.7, 0.7, (n, 3))
        scales = np.exp(rng.uniform(np.log(0.008), np.log(0.04), (n, 3)))
        quats = rng.normal(size=(n, 4))
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        opac = rng.uniform(0.3, 0.95, n)
        sh = rng.normal(size=(n, 16, 3)) * 0.2
        gs = tuple(
            jnp.asarray(a, jnp.float32)
            for a in (means, scales, quats, opac, sh)
        )
        cam = look_at_camera(eye=[0.0, 0.0, -3.0], target=[0.0, 0.0, 0.0])
        cfg = RasterConfig(
            width=512, height=512, tile_w=32, tile_h=16, chunk=128,
            max_instances=1 << 19,
        )

        def consume(p):
            fe = pack_fields(p)  # consumes means2d/conics/colors/opac
            return (
                jnp.sum(fe) * 1e-9
                + jnp.sum(p.depths) * 1e-9
                + jnp.sum(p.rect).astype(jnp.float32) * 1e-9
            )

        def timed(fn, *xs):
            @jax.jit
            def prog(xs, salt):
                def body(i, acc):
                    return acc + fn(xs, salt + i.astype(jnp.float32) * 1e-6)

                return jax.lax.fori_loop(0, iters, body, 0.0)

            r = float(prog(xs, 0.0))
            t0 = time.time()
            r = float(prog(xs, 1e-4))
            dt = (time.time() - t0) / iters * 1e3
            assert np.isfinite(r)
            return round(dt, 3)

        def pre_cur(xs, salt):
            (m, s, q, o, shh) = xs[0]
            o = jnp.clip(o + salt, 0, 1)
            return consume(preprocess(m, s, q, o, shh, cam, cfg))

        # variant: SH already [N,48]; reshape to [N,16,3] INSIDE the jit
        # (tests whether the relayout from a dense argument beats reading
        # a padded argument)
        sh48 = jnp.asarray(
            np.ascontiguousarray(sh.reshape(n, 48)), jnp.float32
        )

        def pre_48(xs, salt):
            (m, s, q, o, sh48_) = xs[0]
            o = jnp.clip(o + salt, 0, 1)
            shh = sh48_.reshape(n, 16, 3)
            return consume(preprocess(m, s, q, o, shh, cam, cfg))

        # variant: no SH at all (colors precomputed [N,3]) — upper bound
        cols = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)

        def pre_nosh(xs, salt):
            (m, s, q, o, c) = xs[0]
            o = jnp.clip(o + salt, 0, 1)
            return consume(
                preprocess(
                    m, s, q, o,
                    jnp.zeros((n, 1, 3), jnp.float32),
                    cam, cfg, active_sh_degree=0, colors_precomp=c,
                )
            )

        out = {
            "pre_cur": timed(pre_cur, gs),
            "pre_sh48_arg": timed(pre_48, (gs[0], gs[1], gs[2], gs[3], sh48)),
            "pre_colors_precomp": timed(
                pre_nosh, (gs[0], gs[1], gs[2], gs[3], cols)
            ),
        }
        print(json.dumps({"pre_ms": out}), flush=True)


if __name__ == "__main__":
    main()
