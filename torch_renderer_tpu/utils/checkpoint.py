"""Checkpoint / resume for optimization state.

The reference has NO optimizer-state checkpointing — only periodic save_obj
mesh snapshots (SURVEY.md §5: deform_mesh_from_pcd.py:199-209,
mesh_deformer.py:338-349). The rebuild adds real (params, opt_state, step)
checkpoints so long fits resume exactly: pytrees are flattened to an .npz
(restore takes a template pytree for the treedef), with an orbax-compatible
directory layout available for users who prefer it.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, tree: Any, step: Optional[int] = None) -> None:
    """Save any pytree of arrays to `path` (.npz appended if missing)."""
    leaves, _ = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if step is not None:
        payload["__step__"] = np.asarray(step)
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **payload)


def load_checkpoint(path: str, like: Any) -> Tuple[Any, Optional[int]]:
    """Restore a pytree saved by save_checkpoint. `like` supplies the tree
    structure (e.g. a freshly initialized (params, opt_state) tuple).
    Returns (tree, step)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    _, treedef = jax.tree_util.tree_flatten(like)
    n = treedef.num_leaves
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    step = int(data["__step__"]) if "__step__" in data else None
    return jax.tree_util.tree_unflatten(treedef, leaves), step


def save_checkpoint_orbax(path: str, tree: Any) -> None:
    """Orbax-backed checkpoint (directory layout; async-capable, multi-host
    friendly). Use for large states; the .npz path is the zero-dependency
    default."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    # StandardCheckpointer saves asynchronously; block until the files are
    # committed so an immediate restore (or process exit) is safe.
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path), like)


def export_mesh_snapshot(path: str, meshes, index: int = 0, verts_rgb=None) -> None:
    """OBJ snapshot of one mesh from a padded batch (the reference's
    periodic save_obj checkpoints)."""
    from ..io.obj import save_obj

    v, f = meshes.detach_to_lists()[index]
    rgb = None if verts_rgb is None else np.asarray(verts_rgb)[: v.shape[0]]
    save_obj(path, v, f, verts_rgb=rgb)
