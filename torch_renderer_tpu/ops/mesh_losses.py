"""Mesh regularization losses + static topology precompute.

Replaces pytorch3d's mesh_edge_loss / mesh_laplacian_smoothing(uniform) /
mesh_normal_consistency (reference deform_mesh_from_pcd.py:175-181,
mesh_deformer.py:314-320, deform_mesh_with_color.py:248-256).

TPU design: mesh topology (unique edges, adjacent-face pairs, vertex degrees)
is constant across an optimization run, so it is extracted ONCE on the host
into padded int arrays (MeshTopology) and every per-step loss is a masked
gather + segment-sum — fully jittable, no dynamic shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..structures.meshes import Meshes


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeshTopology:
    edges: jax.Array       # (B, E, 2) int32 unique undirected edges (zero-pad)
    num_edges: jax.Array   # (B,)
    adj: jax.Array         # (B, A, 4) int32 [v0, v1, opp_a, opp_b] per
                           #   face-pair sharing edge (v0, v1)
    num_adj: jax.Array     # (B,)
    degree: jax.Array      # (B, V) float32 vertex degrees (0 for padded)

    def edge_mask(self) -> jax.Array:
        return (
            jnp.arange(self.edges.shape[1])[None] < self.num_edges[:, None]
        ).astype(jnp.float32)

    def adj_mask(self) -> jax.Array:
        return (
            jnp.arange(self.adj.shape[1])[None] < self.num_adj[:, None]
        ).astype(jnp.float32)


def build_topology(meshes: Meshes) -> MeshTopology:
    """Host-side (numpy) topology extraction from a padded Meshes batch."""
    faces_np = np.asarray(meshes.faces)
    nf = np.asarray(meshes.num_faces)
    V = meshes.max_verts
    B = meshes.batch_size

    all_edges, all_adj, degrees = [], [], []
    for b in range(B):
        f = faces_np[b, : nf[b]].astype(np.int64)
        e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        e.sort(axis=1)
        # third vertex opposite each directed edge record
        opp = np.concatenate([f[:, 2], f[:, 0], f[:, 1]])
        uniq, inv = np.unique(e, axis=0, return_inverse=True)
        all_edges.append(uniq)

        deg = np.zeros(V, np.float32)
        np.add.at(deg, uniq[:, 0], 1)
        np.add.at(deg, uniq[:, 1], 1)
        degrees.append(deg)

        # group opposite vertices per unique edge; emit all pairs (manifold
        # meshes give exactly 2; boundary edges give none)
        order = np.argsort(inv, kind="stable")
        inv_sorted = inv[order]
        opp_sorted = opp[order]
        adj = []
        start = 0
        for i in range(1, len(inv_sorted) + 1):
            if i == len(inv_sorted) or inv_sorted[i] != inv_sorted[start]:
                group = opp_sorted[start:i]
                if len(group) >= 2:
                    v0, v1 = uniq[inv_sorted[start]]
                    for x in range(len(group)):
                        for y in range(x + 1, len(group)):
                            adj.append([v0, v1, group[x], group[y]])
                start = i
        all_adj.append(np.asarray(adj, np.int64).reshape(-1, 4))

    E = max(e.shape[0] for e in all_edges)
    A = max(max(a.shape[0] for a in all_adj), 1)

    def pad(a, n):
        out = np.zeros((n,) + a.shape[1:], np.int32)
        out[: a.shape[0]] = a
        return out

    return MeshTopology(
        edges=jnp.asarray(np.stack([pad(e, E) for e in all_edges])),
        num_edges=jnp.asarray([e.shape[0] for e in all_edges], jnp.int32),
        adj=jnp.asarray(np.stack([pad(a, A) for a in all_adj])),
        num_adj=jnp.asarray([a.shape[0] for a in all_adj], jnp.int32),
        degree=jnp.asarray(np.stack(degrees)),
    )


# One-hot MXU row gather / scatter-add (ops.rowops): arbitrary-index
# gathers of (V, 3) arrays run nearly scalar on TPU and their backward is
# a serializing scatter-add; these loss gathers measured ~2.2 ms of a
# 15 ms joint-fit step as sort-based scatter fusions.
from .rowops import add_rows as _add_rows  # noqa: E402
from .rowops import take_rows as _take_rows  # noqa: E402


def mesh_edge_loss(
    meshes: Meshes, topo: MeshTopology, target_length: float = 0.0,
    method: str = "auto",
) -> jax.Array:
    """Mean squared deviation of edge lengths from target (pytorch3d parity:
    mean over edges, averaged over the batch)."""
    def per_mesh(verts, edges):
        both = _take_rows(verts, edges.T.reshape(-1), method)  # (2E, 3)
        E = edges.shape[0]
        d = both[:E] - both[E:]
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)

    lens = jax.vmap(per_mesh)(meshes.verts, topo.edges)  # (B, E)
    m = topo.edge_mask()
    ne = jnp.clip(topo.num_edges.astype(jnp.float32), 1, None)
    per = jnp.sum(((lens - target_length) ** 2) * m, axis=-1) / ne
    return jnp.mean(per)


def mesh_laplacian_smoothing(
    meshes: Meshes, topo: MeshTopology, method: str = "auto"
) -> jax.Array:
    """Uniform Laplacian magnitude: mean_i | (1/deg_i) sum_j v_j - v_i |."""
    V = meshes.max_verts

    def per_mesh(verts, edges, emask, deg):
        w = emask[:, None]  # (E, 1)
        both = _take_rows(verts, edges.T.reshape(-1), method)  # (2E, 3)
        E = edges.shape[0]
        acc = _add_rows(both[E:] * w, edges[:, 0], V, method)
        acc = acc + _add_rows(both[:E] * w, edges[:, 1], V, method)
        lap = acc / jnp.clip(deg, 1.0, None)[:, None] - verts
        norm = jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-12)
        live = (deg > 0).astype(verts.dtype)
        return jnp.sum(norm * live) / jnp.clip(jnp.sum(live), 1.0, None)

    per = jax.vmap(per_mesh)(meshes.verts, topo.edges, topo.edge_mask(), topo.degree)
    return jnp.mean(per)


def mesh_normal_consistency(
    meshes: Meshes, topo: MeshTopology, method: str = "auto"
) -> jax.Array:
    """Mean (1 - cos) between normals of adjacent faces (pytorch3d parity).

    For each face pair sharing edge (v0, v1) with opposite vertices a, b:
    n1 = (v1-v0) x (a-v0), n2 = (v1-v0) x (b-v0); coplanar pairs with a, b on
    opposite sides give cos(n1, -n2) = 1, i.e. zero loss.
    """
    def per_mesh(verts, adj, amask):
        A = adj.shape[0]
        g = _take_rows(verts, adj.T.reshape(-1), method)  # (4A, 3)
        v0 = g[:A]
        e = g[A : 2 * A] - v0
        n1 = jnp.cross(e, g[2 * A : 3 * A] - v0)
        n2 = -jnp.cross(e, g[3 * A :] - v0)
        cos = jnp.sum(n1 * n2, axis=-1) / jnp.clip(
            jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12, None
        )
        return jnp.sum((1.0 - cos) * amask) / jnp.clip(jnp.sum(amask), 1.0, None)

    per = jax.vmap(per_mesh)(meshes.verts, topo.adj, topo.adj_mask())
    return jnp.mean(per)
