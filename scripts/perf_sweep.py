"""Sweep blend-kernel config knobs (chunk, dma_superblock, and optionally
tile_w, tile_h, tiles_per_program) at the bench shape, with bench.py's
exact measurement methodology (fori_loop + salt, autotuned capacity,
means+opacity perturbed per iteration).

Run:  python scripts/perf_sweep.py "128,4 128,8"
      python scripts/perf_sweep.py "128,4,32,16,4 128,4,16,16,8"
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig, render
    from frosting_tpu.raster.render import (
        autotune_max_instances,
        count_instances,
    )

    combos = [
        tuple(int(x) for x in tok.split(","))
        for tok in (
            sys.argv[1].split() if len(sys.argv) > 1 else ["128,4", "128,8"]
        )
    ]

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
    # 50 in-loop iters: the ~32 ms fixed dispatch cost (PERF_NOTES round-3
    # floor correction) biases 10-iter runs by +3.2 ms/iter
    iters = 50

    probe_cfg = RasterConfig(
        width=512, height=512, chunk=128, max_instances=1 << 21,
        backend="auto",
    )
    n_inst = int(
        jax.jit(lambda g, c: count_instances(*g, c, probe_cfg))(gs, cam)
    )
    print("instances:", n_inst, flush=True)

    for combo in combos:
        chunk, sb = combo[0], combo[1]
        tw, th = (combo[2], combo[3]) if len(combo) > 3 else (32, 16)
        tpp = combo[4] if len(combo) > 4 else 0
        # instance counts depend on tile size: re-probe per combo
        pcfg = RasterConfig(
            width=512, height=512, tile_w=tw, tile_h=th, chunk=chunk,
            max_instances=1 << 21, backend="auto",
        )
        n_inst = int(
            jax.jit(lambda g, c, pcfg=pcfg: count_instances(*g, c, pcfg))(
                gs, cam
            )
        )
        cfg = RasterConfig(
            width=512, height=512, tile_w=tw, tile_h=th, chunk=chunk,
            max_instances=autotune_max_instances(n_inst, chunk, safety=1.25),
            dma_superblock=sb, tiles_per_program=tpp, backend="auto",
        )
        target = jnp.zeros((3, 512, 512), jnp.float32)

        def loss_fn(m, s, q, o, shh, camera, tgt):
            out = render(m, s, q, o, shh, camera, cfg)
            return jnp.mean(jnp.abs(out.image - tgt))

        grad_opac = jax.grad(loss_fn, argnums=3)

        @jax.jit
        def bench_prog(m, s, q, o, shh, camera, tgt, salt):
            def body(i, acc):
                it = i.astype(jnp.float32)
                o_i = jnp.clip(o + 0.001 * it + salt, 0, 1)
                m_i = m + 1e-5 * it + salt * 1e-3
                g = grad_opac(m_i, s, q, o_i, shh, camera, tgt)
                return acc + jnp.sum(jnp.abs(g))

            return jax.lax.fori_loop(0, iters, body, 0.0)

        @jax.jit
        def bench_fwd(m, s, q, o, shh, camera, salt):
            def body(i, acc):
                it = i.astype(jnp.float32)
                o_i = jnp.clip(o + 0.001 * it + salt, 0, 1)
                m_i = m + 1e-5 * it + salt * 1e-3
                out = render(m_i, s, q, o_i, shh, camera, cfg)
                return acc + jnp.sum(out.image)

            return jax.lax.fori_loop(0, iters, body, 0.0)

        r = float(bench_prog(*gs, cam, target, 0.0))  # compile
        t0 = time.perf_counter()
        r = float(bench_prog(*gs, cam, target, 0.0171))
        dt = (time.perf_counter() - t0) / iters * 1e3
        rf = float(bench_fwd(*gs, cam, 0.0))
        t0 = time.perf_counter()
        rf = float(bench_fwd(*gs, cam, 0.0171))
        dtf = (time.perf_counter() - t0) / iters * 1e3
        print(
            f"chunk={chunk} sb={sb} tile={tw}x{th} tpp={cfg.tpp} "
            f"cap={cfg.max_instances} inst={n_inst}: "
            f"fwd+bwd {dt:.2f} ms/iter  fwd {dtf:.2f} ms/iter",
            flush=True,
        )


if __name__ == "__main__":
    main()
