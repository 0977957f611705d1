"""Device-mesh construction and batch sharding helpers.

The reference has no distributed machinery at all (SURVEY.md §2d — its only
parallelism is the CUDA batch axis via Meshes.extend, reference
batch_rendering_test.py:325-328). The TPU-native upgrade is SPMD over a
jax.sharding.Mesh:

  * 'data'  axis — shards the batch of (meshes, poses, framebuffers); this is
    the reference's batch axis spread over ICI instead of one chip.
  * 'model' axis — shards the FACE axis of soft-silhouette rendering (the
    coverage sum decomposes over faces; see rasterize/soft.soft_coverage_sum),
    giving tensor-parallel rendering of big meshes.

Scalar loss reduction across 'data' is one psum; face-partial coverage sums
across 'model' are one psum — both ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices=None,
) -> Mesh:
    """Build a device mesh. Default: all devices on 'data', 1 on 'model'.

    shape=(d, m) splits len(devices) chips into d-way data x m-way face
    parallelism (d*m must equal the device count used).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_mesh(axis: str = DATA_AXIS, devices=None) -> Mesh:
    """1-axis mesh over every available device (the bench/app batch-axis
    sharding pattern)."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def data_specs(tree, axis: str = DATA_AXIS):
    """PartitionSpec pytree: every leaf's LEADING dim sharded on `axis`,
    the rest replicated — the in/out_specs of a batch-parallel shard_map
    (bench.py, apps/batch_render_bench.py)."""
    return jax.tree_util.tree_map(
        lambda x: P(axis, *([None] * (x.ndim - 1))), tree
    )


def batch_spec(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """NamedSharding that shards dim 0 over `axis`, replicates the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Place every array in the pytree with its leading (batch) dim sharded
    over `axis`. Leading dims must be divisible by the axis size."""

    def place(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, batch_spec(mesh, x.ndim, axis))

    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    spec = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), spec), tree)


def pad_batch_to(tree, n: int):
    """Zero-pad every leaf's leading dim up to n (so it shards evenly);
    returns (padded_tree, original_batch)."""
    b = None

    def pad(x):
        nonlocal b
        x = jnp.asarray(x)
        b = x.shape[0] if b is None else b
        if x.shape[0] == n:
            return x
        return jnp.pad(x, [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

    return jax.tree_util.tree_map(pad, tree), b


def pad_axis_to_multiple(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    """Pad `axis` of x with zeros up to the next multiple."""
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)
