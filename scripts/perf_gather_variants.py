"""Microbench: gather/decode variants for the binning + instance-field
expansion hot spots (see round-3 trace: gathers are ~11.6 ms of a 27 ms
step, all at scalar rate).

Times each variant with the in-program fori_loop + salt protocol
(PERF_NOTES.md): inputs perturbed per iteration, one dispatch timed.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 100_000
    cap = 423_168
    rows = 489_216

    # monotone run-length expansion indices (the binning decode shape)
    counts = rng.integers(1, 8, n)
    counts = (counts * (cap / counts.sum())).astype(np.int64)
    counts = np.maximum(counts, 1)
    while counts.sum() > cap:
        counts[rng.integers(0, n)] -= 1
    gidx_mono = np.repeat(np.arange(n), counts)
    gidx_mono = np.pad(gidx_mono, (0, cap - len(gidx_mono)), constant_values=n - 1)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])

    # random permutation indices (the backward inv_map shape)
    gidx_rand = rng.integers(0, n, rows).astype(np.int32)

    vals_i = jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32)
    vals_f9 = jnp.asarray(rng.normal(size=(n + 1, 9)), jnp.float32)
    g_mono = jnp.asarray(gidx_mono, jnp.int32)
    g_rand = jnp.asarray(gidx_rand, jnp.int32)
    offs_j = jnp.asarray(offs, jnp.int32)
    grads_t = jnp.asarray(rng.normal(size=(9, rows)), jnp.float32)
    inv_map = jnp.asarray(rng.permutation(rows)[:cap], jnp.int32)

    iters = args.iters

    def timed(name, f, *xs):
        @jax.jit
        def prog(salt, *xs):
            def body(i, acc):
                return acc + f(i + salt, *xs)

            return jax.lax.fori_loop(0, iters, body, 0.0)

        r = float(prog(0, *xs))
        best = float("inf")
        for rep in range(3):
            t0 = time.time()
            r = float(prog(rep + 1, *xs))
            best = min(best, time.time() - t0)
        assert np.isfinite(r)
        print(json.dumps({name: round(best / iters * 1e3, 3)}), flush=True)

    # --- i32 expansion: per-instance value from per-gaussian table ---
    def take_mono(i, vals, g):
        v = vals + i
        out = jnp.take(v, g, mode="clip")
        return jnp.sum(out).astype(jnp.float32) * 1e-9

    timed("i32_take_monotone[cap]", take_mono, vals_i, g_mono)

    def gather_sorted(i, vals, g):
        v = (vals + i)[:, None]
        out = jax.lax.gather(
            v,
            g[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,),
            ),
            (1, 1),
            indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return jnp.sum(out).astype(jnp.float32) * 1e-9

    timed("i32_gather_sorted_flag[cap]", gather_sorted, vals_i, g_mono)

    def decode_scatter(i, vals, offs):
        v = vals + i
        delta = (
            jnp.zeros((cap,), jnp.int32)
            .at[0]
            .add(v[0])
            .at[offs[1:]]
            .add(jnp.diff(v), mode="drop")
        )
        out = jnp.cumsum(delta)
        return jnp.sum(out).astype(jnp.float32) * 1e-9

    timed("i32_diffscatter_cumsum[cap]", decode_scatter, vals_i, offs_j)

    # --- f32 9-channel instance-field expansion (fwd gather) ---
    def take_rows(i, vals, g):
        v = vals + i.astype(jnp.float32)
        out = jnp.take(v, g, axis=0, mode="clip")
        return jnp.sum(out[:, 0]) * 1e-9

    timed("f32x9_take_rows[rows]", take_rows, vals_f9, jnp.concatenate([g_mono, g_mono[: rows - cap]]))

    def take_cols(i, vals, g):
        vt = (vals + i.astype(jnp.float32)).T  # [9, N+1]
        out = jnp.take(vt, g, axis=1, mode="clip")
        return jnp.sum(out[0]) * 1e-9

    timed("f32x9_take_cols[rows]", take_cols, vals_f9, jnp.concatenate([g_mono, g_mono[: rows - cap]]))

    # bare cap-sized i32 cumsum (the non-scatter part of a decode)
    def cumsum_only(i, vals):
        v = jnp.zeros((cap,), jnp.int32).at[0].set(vals[0] + i)
        return jnp.sum(jnp.cumsum(v)).astype(jnp.float32) * 1e-9

    timed("i32_cumsum[cap]", cumsum_only, vals_i)

    # full current-binning decode block: 1 scatter-decode + 2 monotone takes
    def current_combo(i, vals, offs, g):
        v = vals + i
        delta = (
            jnp.zeros((cap,), jnp.int32)
            .at[0]
            .add(v[0])
            .at[offs[1:]]
            .add(jnp.diff(v), mode="drop")
        )
        gauss_c = jnp.cumsum(delta)
        a = jnp.take(v * 3, jnp.minimum(gauss_c, n - 1), mode="clip")
        b = jnp.take(v * 5, jnp.minimum(gauss_c, n - 1), mode="clip")
        return (jnp.sum(a) + jnp.sum(b)).astype(jnp.float32) * 1e-9

    timed("combo_current_1scatter_2takes", current_combo, vals_i, offs_j, g_mono)

    # proposed: 3 scatter-decodes, no takes
    def triple_decode(i, vals, offs):
        def dec(v):
            delta = (
                jnp.zeros((cap,), jnp.int32)
                .at[0]
                .add(v[0])
                .at[offs[1:]]
                .add(jnp.diff(v), mode="drop")
            )
            return jnp.cumsum(delta)

        v = vals + i
        a = dec(v)
        b = dec(v * 3)
        c = dec(v * 5)
        return (jnp.sum(a) + jnp.sum(b) + jnp.sum(c)).astype(jnp.float32) * 1e-9

    timed("combo_3decodes", triple_decode, vals_i, offs_j)

    # proposed: ONE scatter carrying 3 channels as separate scatter ops but
    # shared index computation; plus: one scatter with 2 packed channels +
    # one more (the realistic packing)
    def dual_decode(i, vals, offs):
        def dec(v):
            delta = (
                jnp.zeros((cap,), jnp.int32)
                .at[0]
                .add(v[0])
                .at[offs[1:]]
                .add(jnp.diff(v), mode="drop")
            )
            return jnp.cumsum(delta)

        v = vals + i
        a = dec(v)
        b = dec(v * 3)
        return (jnp.sum(a) + jnp.sum(b)).astype(jnp.float32) * 1e-9

    timed("combo_2decodes", dual_decode, vals_i, offs_j)

    # --- backward inv_map permutation gather ---
    def invmap_take(i, gt, im):
        g = gt + i.astype(jnp.float32)
        out = jnp.take(g, im, axis=1, mode="clip")
        return jnp.sum(out[0]) * 1e-9

    timed("f32x9_invmap_take_cols[cap]", invmap_take, grads_t, inv_map)

    # sort-based permutation apply: carry 9 payload channels through a sort
    def invmap_sort(i, gt, im):
        g = gt + i.astype(jnp.float32)
        ops = (im,) + tuple(g[j, :cap] for j in range(9))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        return jnp.sum(out[1]) * 1e-9

    timed("f32x9_invmap_sort10[cap]", invmap_sort, grads_t, inv_map)


if __name__ == "__main__":
    main()
