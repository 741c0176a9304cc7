"""Round-4 same-session A/B: decode gather-vs-scatter x bwd_sort_bf16,
full fwd+bwd step at the bench shape (bench.py methodology)."""

import json
import sys
import time

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig, render
    from frosting_tpu.raster.render import (
        autotune_max_instances,
        count_instances,
    )

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
    probe_cfg = RasterConfig(
        width=512, height=512, tile_w=32, tile_h=16, chunk=128,
        max_instances=1 << 21, backend="auto",
    )
    n_inst = int(
        jax.jit(lambda g, c: count_instances(*g, c, probe_cfg))(gs, cam)
    )
    base = RasterConfig(
        width=512, height=512, tile_w=32, tile_h=16, chunk=128,
        max_instances=autotune_max_instances(n_inst, 128, safety=1.25),
        backend="auto",
    )
    target = jnp.zeros((3, 512, 512), jnp.float32)
    iters = 100

    combos = [
        ("scatter_f32", dict(decode="scatter", bwd_sort_bf16=False)),
        ("gather_f32", dict(decode="gather", bwd_sort_bf16=False)),
        ("gather_bf16", dict(decode="gather", bwd_sort_bf16=True)),
        ("scatter_bf16", dict(decode="scatter", bwd_sort_bf16=True)),
    ]
    results = {}
    for name, kw in combos:
        cfg = dataclasses.replace(base, **kw)

        def loss_fn(means, scales, quats, opac, sh, camera, tgt):
            out = render(means, scales, quats, opac, sh, camera, cfg)
            return jnp.mean(jnp.abs(out.image - tgt))

        grad_opac = jax.grad(loss_fn, argnums=3)

        @jax.jit
        def prog(means, scales, quats, opac, sh, camera, tgt, salt):
            def body(i, acc):
                it = i.astype(jnp.float32)
                opac_i = jnp.clip(opac + 0.001 * it + salt, 0, 1)
                means_i = means + 1e-5 * it + salt * 1e-3
                g = grad_opac(
                    means_i, scales, quats, opac_i, sh, camera, tgt
                )
                return acc + jnp.sum(jnp.abs(g))

            return jax.lax.fori_loop(0, iters, body, 0.0)

        r = float(prog(*gs, cam, target, 0.0))
        dt = float("inf")
        for rep in range(3):
            t0 = time.time()
            r = float(prog(*gs, cam, target, 0.017 + 0.003 * rep))
            dt = min(dt, time.time() - t0)
        assert np.isfinite(r)
        mpix = 512 * 512 * iters / dt / 1e6
        results[name] = {
            "ms_per_iter": round(dt / iters * 1e3, 2),
            "mpix_s": round(mpix, 2),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"n_inst": n_inst, "cap": base.max_instances,
                      **results}))


if __name__ == "__main__":
    main()
