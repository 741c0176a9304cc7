"""Multi-host runtime: process initialization and DCN-aware mesh layout.

The reference is strictly single-GPU/single-process (SURVEY.md §2:
`torch.cuda.set_device` only, no torch.distributed anywhere), so this is a
greenfield subsystem mandated by the BASELINE north star (≥80% linear
pixels/s scaling to 2 hosts).

Design (How-to-Scale-Your-Model recipe applied to splatting):
  * the ("data", "tile") mesh axes of parallel/sharded_train keep their
    meaning everywhere; only the DEVICE PLACEMENT changes across hosts.
  * "data" (camera/image batch) is the outer, DCN-friendly axis: its only
    collective is ONE gradient psum per step (bytes ≈ parameter size),
    which tolerates DCN latency and overlaps with the backward blend.
  * "tile" (image-strip) is the inner, ICI-only axis: every render does an
    all_gather of projected gaussians (or the all_to_all instance
    exchange, parallel/exchange.py) plus the SSIM halo exchange — latency
    sensitive, so the axis must never cross a slice boundary.
  * placement therefore groups each process's local devices into whole
    "tile" rows: a tile row lives inside one host's ICI domain, and the
    data axis strides across hosts/slices (DCN).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host JAX runtime (jax.distributed) when a
    multi-process launch is detected or explicitly configured; no-op (and
    returns False) for single-process runs, so every CLI can call it
    unconditionally.

    Detection: explicit args > JAX_COORDINATOR_ADDRESS env (with
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) > TPU pod metadata (handled by
    jax.distributed.initialize() with no args when on multi-host TPU).
    """
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or _env_int("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    # real pod metadata is a comma-separated hostname list; tunnels and
    # broken launchers leave warning strings (with spaces) in the var
    pod_detected = bool(hostnames) and " " not in hostnames and (
        "," in hostnames
    )
    try:
        if coord is not None:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=nproc,
                process_id=pid,
            )
            return True
        if pod_detected or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            return True
    except (RuntimeError, ValueError):
        # already initialized by the launcher, or metadata incomplete —
        # fall back to whatever the runtime already knows
        return jax.process_count() > 1
    return False


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def arrange_devices(
    devices: Sequence, n_data: int, n_tile: int
) -> np.ndarray:
    """Arrange devices into an [n_data, n_tile] array such that every
    "tile" row is contained in ONE process's device set whenever the
    per-process device count allows it (then only the "data" axis crosses
    DCN). Pure over (process_index, id) attributes, so the placement
    policy is unit-testable without a pod."""
    if len(devices) < n_data * n_tile:
        raise ValueError(
            f"need {n_data * n_tile} devices, have {len(devices)}"
        )
    devs = sorted(
        devices, key=lambda d: (getattr(d, "process_index", 0), d.id)
    )[: n_data * n_tile]
    # process-major order + row-major reshape: whenever each process's
    # device count is a multiple of n_tile, every consecutive n_tile-run
    # (= one tile row) is single-process and only "data" crosses DCN.
    # Otherwise the same layout is still CORRECT, just with per-render
    # collectives crossing DCN — check with tile_rows_are_local().
    return np.asarray(devs).reshape(n_data, n_tile)


def make_hybrid_mesh(n_data: int, n_tile: int, devices=None) -> Mesh:
    """("data", "tile") mesh with multi-host-aware placement (see module
    docstring). Single-process (including the virtual CPU test mesh) is
    the degenerate case of the same policy."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(arrange_devices(devices, n_data, n_tile), ("data", "tile"))


def tile_rows_are_local(mesh: Mesh) -> bool:
    """True when every "tile" row of the mesh lives inside one process —
    the placement invariant that keeps per-render collectives on ICI."""
    dev = np.asarray(mesh.devices)
    for row in dev.reshape(-1, dev.shape[-1]):
        procs = {getattr(d, "process_index", 0) for d in row}
        if len(procs) > 1:
            return False
    return True
