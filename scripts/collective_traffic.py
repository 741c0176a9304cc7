"""Per-axis collective-traffic analysis of the sharded refine step at
BASELINE config-5 shapes (5M gaussians, 1080p) — compiled-program evidence
for the multi-host scaling claim (SURVEY §5 distributed backend; BASELINE
">=80% linear to 2 hosts").

Real multi-host hardware is not reachable in this environment, but the
collectives the step performs ARE fully determined by the lowered program:
shard_map collectives appear explicitly in the StableHLO with their
replica_groups. This script traces the param-sharded frosting refine step
on an (data=2, tile=4) virtual mesh at config-5 shapes (TRACE ONLY — no
execution, shapes drive everything), classifies every collective by mesh
axis from its replica groups, and totals payload bytes per axis.

Axis -> physical network mapping (parallel/multihost.py placement
invariant): the "tile" axis is laid out within a host's ICI domain; only
the "data" (camera) axis crosses hosts over DCN. So the DCN-byte total
here is the per-step inter-host traffic, and "DCN time < f * step" gives
the bandwidth bound printed at the end.

Run: python scripts/collective_traffic.py [--n-gaussians 5000000] ...
Writes: COLLECTIVES.json (merged into SCALING.json by --merge).
"""

import argparse
import json
import math
import os
import re

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "i64": 8, "ui64": 8, "i32": 4, "ui32": 4, "i16": 2, "ui16": 2,
    "i8": 1, "ui8": 1, "i1": 1, "pred": 1,
}

_TENSOR_RE = re.compile(r"tensor<([0-9x]*)x?([a-z]+[0-9]*)>")
_GROUPS_RE = re.compile(r"replica_groups\s*=\s*dense<(\[\[.*?\]\])>")
_OP_RE = re.compile(
    r'"stablehlo\.(all_gather|all_reduce|reduce_scatter|all_to_all|'
    r"collective_permute)\""
)


def tensor_bytes(type_str):
    """Bytes of one tensor<...> type string."""
    m = _TENSOR_RE.search(type_str)
    if not m:
        return 0
    dims, dt = m.groups()
    n = 1
    for d in dims.split("x"):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def classify_groups(groups, n_tile):
    """Map replica_groups to a mesh-axis label. Mesh (data, tile) with
    device id = d * n_tile + t: tile groups are runs of consecutive ids,
    data groups have stride n_tile, full groups span both axes."""
    g0 = groups[0]
    if len(groups) == 1 and len(g0) > n_tile:
        return "both"
    strides = {b - a for a, b in zip(g0, g0[1:])} or {0}
    if strides == {1}:
        return "tile"
    if strides == {n_tile}:
        return "data"
    return "both"


def analyze(text, n_tile):
    """Parse lowered StableHLO; return per-collective records."""
    records = []
    lines = text.splitlines()
    for i, line in enumerate(lines):
        op_m = _OP_RE.search(line)
        if not op_m:
            continue
        if " : (" not in line:
            # region-carrying ops (all_reduce/reduce_scatter) put the
            # FUNCTION type signature (": (" with parens — the dense
            # replica_groups attribute's ": tensor<..>" has none) after
            # the region close: "}) : (...) -> ..."
            for j in range(i + 1, min(i + 40, len(lines))):
                if "}) : (" in lines[j]:
                    line = line + lines[j]
                    break
        op = op_m.group(1)
        g_m = _GROUPS_RE.search(line)
        if not g_m:
            continue
        groups = json.loads(g_m.group(1))
        axis = classify_groups(groups, n_tile)
        # operand / result types: "... : (tensor<A>, ...) -> tensor<B>" or
        # for all_reduce regions the signature comes later; fall back to
        # the first tensor type on the line (operand)
        if " : (" not in line:
            continue
        sig = line.rsplit(" : (", 1)[-1]
        arrow = sig.split("->")
        in_bytes = sum(
            tensor_bytes(m.group(0))
            for m in _TENSOR_RE.finditer(arrow[0])
        )
        out_bytes = (
            sum(
                tensor_bytes(m.group(0))
                for m in _TENSOR_RE.finditer(arrow[1])
            )
            if len(arrow) > 1
            else in_bytes
        )
        group_size = len(groups[0])
        # bytes each participant moves over the network (ring algorithms):
        #   all_gather:      (g-1)/g * result
        #   reduce_scatter:  (g-1)/g * operand
        #   all_reduce:      2 (g-1)/g * operand
        #   all_to_all:      (g-1)/g * operand
        frac = (group_size - 1) / group_size
        if op == "all_gather":
            wire = frac * out_bytes
        elif op == "all_reduce":
            wire = 2.0 * frac * in_bytes
        else:
            wire = frac * in_bytes
        records.append(
            dict(
                op=op,
                axis=axis,
                group_size=group_size,
                operand_bytes=int(in_bytes),
                result_bytes=int(out_bytes),
                wire_bytes_per_device=int(wire),
            )
        )
    return records


def build_step(n_gaussians, n_verts, width, height, n_data, n_tile,
               max_instances, shard_params, primitive_exchange):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.models.frosting import FrostingMeta, FrostingParams
    from frosting_tpu.parallel import sharded_frosting as sf
    from frosting_tpu.parallel import sharded_train as st
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.train import frosting_trainer

    rcfg = RasterConfig(
        width=width, height=height, chunk=256,
        max_instances=max_instances, backend="jax",
    )
    tcfg = frosting_trainer.FrostingTrainConfig(iterations=1, lr_max_steps=10)
    mesh = st.make_mesh(n_data=n_data, n_tile=n_tile)

    n_faces = 2 * n_verts
    # meta arrays are trace CONSTANTS — real (cheap synthetic) arrays
    rng = np.random.default_rng(0)
    meta = FrostingMeta(
        faces=jnp.asarray(
            rng.integers(0, n_verts, (n_faces, 3)), jnp.int32
        ),
        cell_idx=jnp.sort(
            jnp.asarray(rng.integers(0, n_faces, (n_gaussians,)), jnp.int32)
        ),
        cell_bounds=None,
    )
    sds = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    params = FrostingParams(
        shell_verts=sds((n_verts, 3)),
        inner_dist=sds((n_verts,)),
        outer_dist=sds((n_verts,)),
        bary_logits=sds((n_gaussians, 6)),
        scales_log=sds((n_gaussians, 3)),
        quats_raw=sds((n_gaussians, 4)),
        opacities_raw=sds((n_gaussians,)),
        sh_dc=sds((n_gaussians, 1, 3)),
        sh_rest=sds((n_gaussians, 15, 3)),
        bg=None,
    )
    tx = frosting_trainer.make_frosting_optimizer(tcfg, 3.5)
    opt_state = jax.eval_shape(tx.init, params)
    step = sf.make_sharded_frosting_step(
        tx, rcfg, tcfg, mesh, meta,
        shard_params=shard_params,
        primitive_exchange=primitive_exchange,
        exchange_cap=(max_instances // n_tile if primitive_exchange else 0),
    )
    cam = look_at_camera(eye=[0.0, -0.5, -3.0], target=[0.0, 0.0, 0.0])
    cam_b = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            (n_data,) + jnp.shape(jnp.asarray(x)), jnp.float32
        ),
        cam,
    )
    gts = jax.ShapeDtypeStruct((n_data, 3, height, width), jnp.float32)
    lowered = step.lower(params, opt_state, cam_b, gts)
    return lowered.as_text()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-gaussians", type=int, default=5_000_000)
    ap.add_argument("--n-verts", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--n-data", type=int, default=2)
    ap.add_argument("--n-tile", type=int, default=4)
    ap.add_argument("--max-instances", type=int, default=1 << 22)
    ap.add_argument("--step-ms", type=float, default=632.0,
                    help="measured single-chip step cost for the bound")
    ap.add_argument("--out", default="COLLECTIVES.json")
    args = ap.parse_args()

    results = {}
    for name, sp, px in (
        ("replicated_gather", False, False),
        ("sharded_params_gather", True, False),
        ("sharded_params_exchange", True, True),
    ):
        print(f"[collectives] tracing {name} ...", flush=True)
        text = build_step(
            args.n_gaussians, args.n_verts, args.width, args.height,
            args.n_data, args.n_tile, args.max_instances, sp, px,
        )
        recs = analyze(text, args.n_tile)
        per_axis = {}
        for r in recs:
            per_axis[r["axis"]] = per_axis.get(r["axis"], 0) + r[
                "wire_bytes_per_device"
            ]
        # "both"-axis collectives cross DCN too; attribute them to DCN in
        # the bound (conservative)
        dcn = per_axis.get("data", 0) + per_axis.get("both", 0)
        ici = per_axis.get("tile", 0)
        step_s = args.step_ms / 1e3
        results[name] = {
            "n_collectives": len(recs),
            "per_axis_wire_bytes_per_device": per_axis,
            "dcn_bytes_per_step_per_device": dcn,
            "ici_bytes_per_step_per_device": ici,
            "dcn_bw_GBps_needed_for_20pct_step": round(
                dcn / (0.2 * step_s) / 1e9, 3
            ),
            "collectives": recs,
        }
        print(
            f"[collectives] {name}: {len(recs)} collectives, "
            f"DCN {dcn/1e6:.1f} MB/step, ICI {ici/1e6:.1f} MB/step, "
            f"DCN bw needed for <20% of a {args.step_ms} ms step: "
            f"{dcn / (0.2 * step_s) / 1e9:.2f} GB/s",
            flush=True,
        )

    out = {
        "config": {
            "n_gaussians": args.n_gaussians,
            "n_verts": args.n_verts,
            "resolution": [args.width, args.height],
            "mesh": {"data": args.n_data, "tile": args.n_tile},
            "assumed_step_ms": args.step_ms,
        },
        "note": (
            "trace-only analysis of the lowered StableHLO (shard_map "
            "collectives are explicit pre-compile); wire bytes use ring-"
            "algorithm costs; the data axis maps to DCN per "
            "parallel/multihost.py's placement invariant"
        ),
        "routes": {
            k: {kk: vv for kk, vv in v.items() if kk != "collectives"}
            for k, v in results.items()
        },
        "top_collectives": {
            k: sorted(
                v["collectives"],
                key=lambda r: -r["wire_bytes_per_device"],
            )[:8]
            for k, v in results.items()
        },
    }
    with open(args.out, "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps(out["routes"], indent=1))


if __name__ == "__main__":
    main()
