"""Microbench: VPU elementwise throughput by dtype on this TPU.

If bf16 elementwise runs 2x f32, a mixed-precision blend kernel nearly
halves the VPU-bound compositing cost. Chains dependent FMAs so the
measurement is issue-rate-bound, not memory-bound.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    reps = 400  # chained ops inside the kernel
    iters = 100

    def make_kernel(dt):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            y = x
            for _ in range(reps):
                y = y * jnp.asarray(0.25, x.dtype) + x
            o_ref[:] = y

        return kernel

    def timed(name, f, *xs):
        @jax.jit
        def prog(salt, *xs):
            def body(i, acc):
                return acc + jnp.sum(
                    f(xs[0] + ((i + salt) * 1e-6).astype(xs[0].dtype))
                ).astype(jnp.float32) * 1e-9

            return jax.lax.fori_loop(0, iters, body, 0.0)

        r = float(prog(0, *xs))
        best = float("inf")
        for rep in range(3):
            t0 = time.time()
            r = float(prog(rep + 1, *xs))
            best = min(best, time.time() - t0)
        assert np.isfinite(r)
        per_iter_ms = best / iters * 1e3
        elems = xs[0].size
        ops_per_s = elems * reps * 2 / (per_iter_ms * 1e-3)
        print(
            json.dumps(
                {name: round(per_iter_ms, 4), "Tops/s": round(ops_per_s / 1e12, 2)}
            ),
            flush=True,
        )

    for dt, nm in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        shape = (1024, 512)
        x = jnp.asarray(np.random.default_rng(0).normal(size=shape) * 1e-3, dt)

        def f(x, dt=dt):
            return pl.pallas_call(
                make_kernel(dt),
                out_shape=jax.ShapeDtypeStruct(x.shape, dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        timed(f"chain_fma_{nm}", f, x)

    # exp throughput by dtype
    def make_exp_kernel():
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            y = x
            for _ in range(40):
                y = jnp.exp(y * 0.25)
            o_ref[:] = y

        return kernel

    for dt, nm in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        shape = (1024, 512)
        x = jnp.asarray(np.random.default_rng(0).normal(size=shape) * 1e-3, dt)

        def f(x):
            return pl.pallas_call(
                make_exp_kernel(),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        timed(f"chain_exp40_{nm}", f, x)


if __name__ == "__main__":
    main()
