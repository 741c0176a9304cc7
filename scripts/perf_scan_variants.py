"""Microbench: in-kernel lane-scan implementations for chunk_math.

The Hillis-Steele cumprod (7 shifted multiplies) + tree_prod (7 halving
concats) are ~half the blend kernels' VPU ops. Compares concat-based
shifts (current) against pltpu.roll + constant-mask select, at the real
chunk shape (P=512, K=128), 30 scans per kernel call.
"""

import functools
import json
import time

import numpy as np

P, K, REPS = 512, 128, 30


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def shift_concat(x, s):
        return jnp.concatenate(
            [jnp.full(x.shape[:1] + (s,), 1.0, x.dtype), x[:, :-s]], axis=1
        )

    def cumprod_concat(x):
        y = x
        s = 1
        while s < K:
            y = y * shift_concat(y, s)
            s *= 2
        return y

    def cumprod_roll(x):
        y = x
        s = 1
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        while s < K:
            rolled = pltpu.roll(y, s, 1)
            y = y * jnp.where(lane < s, 1.0, rolled)
            s *= 2
        return y

    def tree_prod_concat(x):
        k = x.shape[1]
        while k > 1:
            half = k // 2
            x = x[:, :half] * x[:, half : 2 * half]
            k = half
        return x

    def tree_prod_roll(x):
        s = 1
        y = x
        while s < K:
            y = y * pltpu.roll(y, s, 1)
            s *= 2
        return y[:, :1]

    def make_kernel(scan_fn, prod_fn):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            acc = jnp.zeros((P, 1), jnp.float32)
            y = x
            for _ in range(REPS):
                incl = scan_fn(y)
                acc = acc + prod_fn(incl)
                y = y * 0.999 + 1e-4
            o_ref[:] = acc

        return kernel

    def timed(name, kernel):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        iters = 100

        @jax.jit
        def prog(salt, x):
            def body(i, acc):
                return acc + jnp.sum(f(x + (i + salt) * 1e-7)) * 1e-9

            return jax.lax.fori_loop(0, iters, body, 0.0)

        x = jnp.asarray(
            np.random.default_rng(0).uniform(0.9, 1.0, (P, K)), jnp.float32
        )
        r = float(prog(0, x))
        best = float("inf")
        for rep in range(3):
            t0 = time.time()
            r = float(prog(rep + 1, x))
            best = min(best, time.time() - t0)
        assert np.isfinite(r)
        print(
            json.dumps({name: round(best / iters * 1e3, 4)}), flush=True
        )

    timed("scan_concat+prod_concat", make_kernel(cumprod_concat, tree_prod_concat))
    timed("scan_roll+prod_roll", make_kernel(cumprod_roll, tree_prod_roll))
    timed("scan_concat+prod_roll", make_kernel(cumprod_concat, tree_prod_roll))
    timed("scan_roll+prod_concat", make_kernel(cumprod_roll, tree_prod_concat))

    # correctness cross-check (interpret mode off; compare on device)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0.9, 1.0, (P, K)), jnp.float32
    )

    def once(scan_fn, prod_fn):
        def kernel(x_ref, o_ref, p_ref):
            incl = scan_fn(x_ref[:])
            o_ref[:] = incl
            p_ref[:] = prod_fn(incl) * jnp.ones((P, 1), jnp.float32)

        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((P, K), jnp.float32),
                jax.ShapeDtypeStruct((P, 1), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )(x)

    a_i, a_p = once(cumprod_concat, tree_prod_concat)
    b_i, b_p = once(cumprod_roll, tree_prod_roll)
    print("incl allclose:", bool(jnp.allclose(a_i, b_i, rtol=0, atol=0)))
    print("prod allclose:", bool(jnp.allclose(a_p, b_p, rtol=1e-6)))


if __name__ == "__main__":
    main()
