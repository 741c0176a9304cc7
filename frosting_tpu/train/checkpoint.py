"""Checkpoint save/restore via orbax (the torch-pickle .pt analogue).

The reference saves {state_dict, optimizer_state_dict, iteration} pickles
(sugar_model.py:2389-2394, frosting_model.py:1739-1744) and never resumes
mid-stage; here every stage state is an orbax-serializable pytree, so both
artifact hand-off AND mid-stage resume come for free.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(path: str, state: Any, force: bool = True) -> None:
    """Save any pytree of arrays to `path` (a directory)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, state, force=force)


def restore(path: str, template: Any) -> Any:
    """Restore a pytree saved with save(); `template` provides the
    structure/shapes (e.g. a freshly-initialized state)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(path, template)


def save_npz(path: str, state: Any) -> None:
    """Flat .npz fallback (no orbax dependency at load time)."""
    leaves, treedef = jax.tree.flatten(state)
    np.savez(
        path,
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_npz(path: str, template: Any) -> Any:
    z = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = [
        jax.numpy.asarray(z[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    return jax.tree.unflatten(treedef, new_leaves)


def save_frosting(path: str, params, meta) -> None:
    """Self-describing frosting checkpoint (params + topology + background
    Gaussians), loadable without a template — the `.pt` artifact analogue
    (refine.py:574-581)."""
    import dataclasses

    arrays = {
        f.name: np.asarray(getattr(params, f.name))
        for f in dataclasses.fields(params)
        if f.name != "bg"
    }
    if params.bg is not None:
        for f in dataclasses.fields(params.bg):
            arrays[f"bg_{f.name}"] = np.asarray(getattr(params.bg, f.name))
    arrays["meta_faces"] = np.asarray(meta.faces)
    arrays["meta_cell_idx"] = np.asarray(meta.cell_idx)
    if meta.cell_bounds is not None:
        arrays["meta_cell_bounds"] = np.asarray(meta.cell_bounds)
    np.savez(path, **arrays)


def load_frosting(path: str):
    """-> (FrostingParams, FrostingMeta) from save_frosting output."""
    import dataclasses

    import jax.numpy as jnp

    from frosting_tpu.models.frosting import FrostingMeta, FrostingParams
    from frosting_tpu.scene.gaussians import GaussianParams

    z = np.load(path)
    bg = None
    if "bg_means3d" in z:
        bg = GaussianParams(
            **{
                f.name: jnp.asarray(z[f"bg_{f.name}"])
                for f in dataclasses.fields(GaussianParams)
            }
        )
    params = FrostingParams(
        **{
            f.name: jnp.asarray(z[f.name])
            for f in dataclasses.fields(FrostingParams)
            if f.name != "bg"
        },
        bg=bg,
    )
    meta = FrostingMeta(
        faces=jnp.asarray(z["meta_faces"]),
        cell_idx=jnp.asarray(z["meta_cell_idx"]),
        cell_bounds=(
            jnp.asarray(z["meta_cell_bounds"])
            if "meta_cell_bounds" in z
            else None
        ),
    )
    return params, meta
