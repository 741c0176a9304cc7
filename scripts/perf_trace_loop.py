"""Trace the fori-loop bench program and print per-op device times.

The per-dispatch profile is NOT representative of the in-loop execution
(dispatch mode pays extra copies and different scheduling); this traces the
actual benchmark program.
"""

import collections
import glob
import gzip
import json

import numpy as np


def main():
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
    from frosting_tpu.raster.render import (
        autotune_max_instances,
        count_instances,
    )

    probe_cfg = RasterConfig(
        width=512, height=512, chunk=128, max_instances=1 << 21,
        backend="auto",
    )
    n_inst = int(
        jax.jit(lambda g, c: count_instances(*g, c, probe_cfg))(gs, cam)
    )
    cfg = RasterConfig(
        width=512, height=512, chunk=128,
        max_instances=autotune_max_instances(n_inst, 128, safety=1.25),
        backend="pallas",
    )
    print("instances", n_inst, "cap", cfg.max_instances)
    target = jnp.zeros((3, 512, 512), jnp.float32)
    iters = 10

    def loss_fn(m, s, q, o, shh, camera, tgt):
        out = render(m, s, q, o, shh, camera, cfg)
        return jnp.mean(jnp.abs(out.image - tgt))

    grad_opac = jax.grad(loss_fn, argnums=3)

    @jax.jit
    def bench_prog(means, scales, quats, opac, sh, camera, tgt, salt):
        # same per-iteration perturbations as bench.py: means move too, so
        # preprocess/binning/sort stay inside the measured loop
        def body(i, acc):
            it = i.astype(jnp.float32)
            o = jnp.clip(opac + 0.001 * it + salt, 0, 1)
            m = means + 1e-5 * it + salt * 1e-3
            g = grad_opac(m, scales, quats, o, sh, camera, tgt)
            return acc + jnp.sum(jnp.abs(g))

        return jax.lax.fori_loop(0, iters, body, 0.0)

    r = float(bench_prog(*gs, cam, target, 0.0))
    with jax.profiler.trace("/tmp/trace3"):
        r = float(bench_prog(*gs, cam, target, 0.0171))
    print("ran", r)
    d = sorted(glob.glob("/tmp/trace3/plugins/profile/*"))[-1]
    with gzip.open(glob.glob(d + "/*.trace.json.gz")[0]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tnames = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if (
            e.get("ph") == "X"
            and "TPU" in pids.get(e.get("pid"), "")
            and tnames.get((e["pid"], e["tid"])) == "XLA Ops"
        ):
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    tot = sum(dur.values())
    print(f"total XLA-op us: {tot:.0f}  per-iter: {tot / iters:.0f}")
    for nm, dd in dur.most_common(34):
        print(f"{dd / iters:9.1f} us/it x{cnt[nm] // iters:3d}  {nm[:78]}")

    # attribute the top fusions: dump the optimized HLO and print each hot
    # fusion's computation body (op mix + shapes) so "fusion.195" becomes
    # an actionable source location
    hlo = bench_prog.lower(*gs, cam, target, 0.0).compile().as_text()
    with open("/tmp/trace3/hlo.txt", "w") as f:
        f.write(hlo)
    print("\n=== hot fusion bodies (/tmp/trace3/hlo.txt has the full HLO) ===")
    import re

    for nm, dd in dur.most_common(16):
        base = nm.split(".")[0]
        if base not in ("fusion", "sort", "copy", "while"):
            continue
        # find the instruction to get its called computation name
        m = re.search(
            rf"^\s+\S+ = \S+ {re.escape(nm)}\(.*$", hlo, re.MULTILINE
        )
        if not m:
            continue
        line = m.group(0)
        print(f"\n--- {nm} ({dd / iters:.1f} us/it) ---")
        print(line.strip()[:240])
        cm = re.search(r"calls=(\S+?)[,)]", line)
        if cm:
            body = re.search(
                rf"^%?{re.escape(cm.group(1))}[^\n]*\{{(.*?)^\}}",
                hlo,
                re.MULTILINE | re.DOTALL,
            )
            if body:
                ops = collections.Counter(
                    re.findall(r"= \S+? (\S+)\(", body.group(1))
                )
                print("   op mix:", dict(ops.most_common(12)))
                for big in re.findall(
                    r"= (\S*(?:gather|scatter|sort|cumsum|reduce|iota|"
                    r"dot|convolution)\S*)\([^\n]*",
                    body.group(1),
                )[:6]:
                    print("   *", big[:200])


if __name__ == "__main__":
    main()
