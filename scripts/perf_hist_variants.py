"""Microbench: 2-D rect-corner histogram variants (binning._tile_counts_2d).

Current blocked f32 one-hot matmul costs ~1.9 ms/step at 512x512/100k
(0.96 ms scan overhead + 0.95 ms matmul fusions).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    i32 = jnp.int32
    rng = np.random.default_rng(0)
    n = 100_000
    tiles_x, tiles_y = 16, 32
    gx, gy = tiles_x + 1, tiles_y + 1
    g_total = gx * gy  # 561
    tx0 = rng.integers(0, tiles_x, n)
    ty0 = rng.integers(0, tiles_y, n)
    tx1 = tx0 + rng.integers(1, 4, n)
    ty1 = ty0 + rng.integers(1, 4, n)
    rect = jnp.asarray(np.stack([tx0, ty0, np.minimum(tx1, gx - 1), np.minimum(ty1, gy - 1)], 1), i32)
    valid = jnp.asarray(rng.random(n) > 0.05)
    iters = 30

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

    def corners(i, rect, valid):
        r = jnp.minimum(rect + i - i, rect)  # touch salt
        tx0, ty0, tx1, ty1 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
        cidx = jnp.concatenate(
            [ty0 * gx + tx0, ty0 * gx + tx1, ty1 * gx + tx0, ty1 * gx + tx1]
        )
        sign = jnp.repeat(jnp.asarray([1.0, -1.0, -1.0, 1.0], jnp.float32), n)
        sign = sign * jnp.tile(valid.astype(jnp.float32), 4)
        return cidx, sign

    def hist_matmul(i, rect, valid, blk, dt):
        cidx, sign = corners(i, rect, valid)
        lo_sz = 128
        hi_sz = -(-g_total // lo_sz)
        hi = cidx // lo_sz
        lo = cidx - hi * lo_sz
        m = cidx.shape[0]
        pad = (-m) % blk
        cidx_hi = jnp.concatenate([hi, jnp.zeros((pad,), hi.dtype)])
        cidx_lo = jnp.concatenate([lo, jnp.zeros((pad,), lo.dtype)])
        sign_p = jnp.concatenate([sign, jnp.zeros((pad,), sign.dtype)])
        hi_iota = jnp.arange(hi_sz, dtype=i32)[:, None]
        lo_iota = jnp.arange(lo_sz, dtype=i32)[None, :]

        def block_hist(carry, xs):
            h, l, s = xs
            oh_hi = (h[None, :] == hi_iota).astype(dt) * s[None, :].astype(dt)
            oh_lo = (l[:, None] == lo_iota).astype(dt)
            return carry + jax.lax.dot_general(
                oh_hi, oh_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ), None

        nblk = (m + pad) // blk
        if nblk == 1:
            h, l, s = cidx_hi, cidx_lo, sign_p
            oh_hi = (h[None, :] == hi_iota).astype(dt) * s[None, :].astype(dt)
            oh_lo = (l[:, None] == lo_iota).astype(dt)
            marks = jax.lax.dot_general(
                oh_hi, oh_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            marks, _ = jax.lax.scan(
                block_hist,
                jnp.zeros((hi_sz, lo_sz), jnp.float32),
                (
                    cidx_hi.reshape(-1, blk),
                    cidx_lo.reshape(-1, blk),
                    sign_p.reshape(-1, blk),
                ),
            )
        return jnp.sum(marks) * 1e-9

    timed("matmul_f32_blk17", partial(hist_matmul, blk=1 << 17, dt=jnp.float32), rect, valid)
    timed("matmul_bf16_blk17", partial(hist_matmul, blk=1 << 17, dt=jnp.bfloat16), rect, valid)
    timed("matmul_bf16_blk19_noscan", partial(hist_matmul, blk=1 << 19, dt=jnp.bfloat16), rect, valid)
    timed("matmul_f32_blk19_noscan", partial(hist_matmul, blk=1 << 19, dt=jnp.float32), rect, valid)
    timed("matmul_bf16_blk16", partial(hist_matmul, blk=1 << 16, dt=jnp.bfloat16), rect, valid)

    def hist_sort(i, rect, valid):
        r = jnp.minimum(rect + i - i, rect)
        tx0, ty0, tx1, ty1 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
        keys = []
        for tag, (ty, tx) in enumerate(
            [(ty0, tx0), (ty0, tx1), (ty1, tx0), (ty1, tx1)]
        ):
            k = (ty * gx + tx) * 4 + tag
            keys.append(jnp.where(valid, k, g_total * 4))
        key = jnp.concatenate(keys)
        skey = jax.lax.sort((key,), num_keys=1, is_stable=False)[0]
        edges = jnp.arange(g_total * 4 + 1, dtype=i32)
        bounds = jnp.searchsorted(skey, edges, side="left")
        c = (bounds[1:] - bounds[:-1]).reshape(g_total, 4).astype(jnp.float32)
        marks = c[:, 0] - c[:, 1] - c[:, 2] + c[:, 3]
        return jnp.sum(marks) * 1e-9

    timed("sort_searchsorted", hist_sort, rect, valid)


if __name__ == "__main__":
    main()

def main2():
    import jax
    import jax.numpy as jnp
    import json, time
    i32 = jnp.int32
    rng = np.random.default_rng(0)
    n = 100_000
    tiles_x, tiles_y = 16, 32
    gx, gy = tiles_x + 1, tiles_y + 1
    g_total = gx * gy
    tx0 = rng.integers(0, tiles_x, n); ty0 = rng.integers(0, tiles_y, n)
    tx1 = tx0 + rng.integers(1, 4, n); ty1 = ty0 + rng.integers(1, 4, n)
    rect = jnp.asarray(np.stack([tx0, ty0, np.minimum(tx1, gx-1), np.minimum(ty1, gy-1)], 1), i32)
    valid = jnp.asarray(rng.random(n) > 0.05)
    iters = 30
    def timed(name, f, *xs):
        @jax.jit
        def prog(salt, *xs):
            def body(i, acc): return acc + f(i + salt, *xs)
            return jax.lax.fori_loop(0, iters, body, 0.0)
        r = float(prog(0, *xs)); best = float("inf")
        for rep in range(3):
            t0 = time.time(); r = float(prog(rep+1, *xs)); best = min(best, time.time()-t0)
        assert np.isfinite(r)
        print(json.dumps({name: round(best/iters*1e3, 3)}), flush=True)

    def corners_only(i, rect, valid):
        r = jnp.minimum(rect + i - i, rect)
        tx0, ty0, tx1, ty1 = r[:,0], r[:,1], r[:,2], r[:,3]
        cidx = jnp.concatenate([ty0*gx+tx0, ty0*gx+tx1, ty1*gx+tx0, ty1*gx+tx1])
        sign = jnp.repeat(jnp.asarray([1.0,-1.0,-1.0,1.0], jnp.float32), n)
        sign = sign * jnp.tile(valid.astype(jnp.float32), 4)
        return (jnp.sum(cidx) * 1e-9).astype(jnp.float32) + jnp.sum(sign) * 1e-9
    timed("corners_only", corners_only, rect, valid)

    def sort_only(i, rect, valid):
        r = jnp.minimum(rect + i - i, rect)
        tx0, ty0 = r[:,0], r[:,1]
        k = ty0*gx+tx0
        key = jnp.concatenate([k, k+1, k+2, k+3])
        skey = jax.lax.sort((key,), num_keys=1, is_stable=False)[0]
        return jnp.sum(skey).astype(jnp.float32) * 1e-9
    timed("sort400k_only", sort_only, rect, valid)

    def ss_only(i, rect, valid):
        r = jnp.minimum(rect + i - i, rect)
        k = jnp.sort(r[:,1]*gx + r[:,0] + jnp.arange(n, dtype=i32) % 4)
        edges = jnp.arange(g_total*4+1, dtype=i32)
        b = jnp.searchsorted(k, edges, side="left")
        return jnp.sum(b).astype(jnp.float32) * 1e-9
    timed("sort100k_searchsorted", ss_only, rect, valid)

main2()
