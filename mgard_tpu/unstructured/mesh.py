"""Simplicial meshes: levels, uniform refinement, P1 mass operators.

TPU-native counterpart of the reference's MOAB-backed mesh layer
(include/unstructured/MeshLevel.hpp, UniformMeshRefiner.hpp,
MassMatrix.hpp in CODARcode/MGARD).  Instead of entity handles and
per-element loops, a mesh level is a pair of static arrays — node
coordinates and element connectivity — and every operator is a gather /
segment-sum over those arrays, which XLA vectorizes.

Node-ordering invariant (reference MeshHierarchy.hpp:24-48): nodes of the
coarse mesh keep their indices under refinement; new (edge-midpoint)
nodes are appended after them.  So on level ``l`` the first
``ndof(l-1)`` values belong to the coarse mesh ("old" nodes) and the
rest are "new".
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MeshLevel:
    """One simplicial mesh: triangles (d=2) or tetrahedra (d=3).

    ``nodes``: (N, ambient_dim) float64.  ``elements``: (E, d+1) int64.
    ``edge_parents``: for refined meshes, the (n_new, 2) endpoint indices
    of the bisected edge that produced each new node (new node ``k`` has
    index ``n_old + k``); ``None`` for a root mesh.
    """

    nodes: np.ndarray
    elements: np.ndarray
    edge_parents: Optional[np.ndarray] = None
    measures: np.ndarray = field(init=False)

    def __post_init__(self):
        nodes = np.asarray(self.nodes, dtype=np.float64)
        elements = np.asarray(self.elements, dtype=np.int64)
        if elements.ndim != 2 or elements.shape[1] not in (3, 4):
            raise ValueError("elements must be (E, 3) or (E, 4)")
        object.__setattr__(self, "nodes", nodes)
        object.__setattr__(self, "elements", elements)
        object.__setattr__(self, "measures", _measures(nodes, elements))

    @property
    def ndof(self) -> int:
        return self.nodes.shape[0]

    @property
    def dim(self) -> int:
        """Topological dimension (2 = triangles, 3 = tetrahedra)."""
        return self.elements.shape[1] - 1

    # -- P1 finite-element operators ------------------------------------
    # Local mass matrix of a d-simplex with measure |T| is
    #   M_ij = |T| / ((d+1)(d+2)) * (1 + delta_ij)
    # (reference SubsetMassMatrix::do_operator_parentheses,
    # src/unstructured/MassMatrix.cpp:52-60).

    def mass_matvec(self, u: jax.Array) -> jax.Array:
        """b = M u via per-element gather + segment-sum (no assembly)."""
        d = self.dim
        elems = jnp.asarray(self.elements)
        c = jnp.asarray(self.measures / ((d + 1) * (d + 2)), dtype=u.dtype)
        ue = u[elems]                                   # (E, d+1)
        esum = jnp.sum(ue, axis=1, keepdims=True)       # (E, 1)
        contrib = c[:, None] * (ue + esum)              # (E, d+1)
        return jax.ops.segment_sum(
            contrib.reshape(-1), elems.reshape(-1),
            num_segments=self.ndof)

    def mass_diagonal(self) -> np.ndarray:
        """diag(M) — the reference's MassMatrixPreconditioner input."""
        d = self.dim
        c = self.measures / ((d + 1) * (d + 2))
        diag = np.zeros(self.ndof)
        np.add.at(diag, self.elements.reshape(-1),
                  np.repeat(2.0 * c, d + 1))
        return diag

    def containing_elements_measure(self) -> np.ndarray:
        """Per node, total measure of elements containing it (reference
        MeshLevel::containing_elements_measure, used by the s-norm
        indicator factor, src/unstructured/indicators.cpp:12-15)."""
        out = np.zeros(self.ndof)
        np.add.at(out, self.elements.reshape(-1),
                  np.repeat(self.measures, self.dim + 1))
        return out


def _measures(nodes: np.ndarray, elements: np.ndarray) -> np.ndarray:
    corners = nodes[elements]                       # (E, d+1, a)
    vecs = corners[:, 1:, :] - corners[:, :1, :]    # (E, d, a)
    d = elements.shape[1] - 1
    if d == 2:
        if nodes.shape[1] == 2:
            cross = (vecs[:, 0, 0] * vecs[:, 1, 1]
                     - vecs[:, 0, 1] * vecs[:, 1, 0])
            return np.abs(cross) / 2.0
        cross = np.cross(vecs[:, 0, :], vecs[:, 1, :])
        return np.linalg.norm(cross, axis=-1) / 2.0
    det = np.linalg.det(vecs)
    return np.abs(det) / 6.0


def _unique_edges(elements: np.ndarray) -> np.ndarray:
    """Sorted unique (a, b) node pairs (a < b) over all element edges."""
    d = elements.shape[1] - 1
    pairs = [(i, j) for i in range(d + 1) for j in range(i + 1, d + 1)]
    edges = np.concatenate(
        [elements[:, [i, j]] for (i, j) in pairs], axis=0)
    edges = np.sort(edges, axis=1)
    return np.unique(edges, axis=0)


def refine_uniform(mesh: MeshLevel) -> MeshLevel:
    """Uniform refinement: bisect every edge; quadrisect triangles /
    octasect tetrahedra (reference UniformMeshRefiner,
    src/unstructured/UniformMeshRefiner.cpp:50-80).

    New nodes are edge midpoints, appended after the old nodes in
    lexicographic edge order, so coarse indices are preserved.
    """
    edges = _unique_edges(mesh.elements)            # (ne, 2), lexsorted
    n_old = mesh.ndof
    midpoints = 0.5 * (mesh.nodes[edges[:, 0]] + mesh.nodes[edges[:, 1]])
    nodes = np.concatenate([mesh.nodes, midpoints], axis=0)

    # edge (a, b) -> new node index
    edge_id = {(int(a), int(b)): n_old + k
               for k, (a, b) in enumerate(edges)}

    def mid(a, b):
        return edge_id[(min(int(a), int(b)), max(int(a), int(b)))]

    new_elements = []
    d = mesh.dim
    if d == 2:
        for (a, b, c) in mesh.elements:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_elements += [(a, ab, ca), (ab, b, bc),
                             (ca, bc, c), (ab, bc, ca)]
    elif d == 3:
        for (a, b, c, dd) in mesh.elements:
            ab, ac, ad = mid(a, b), mid(a, c), mid(a, dd)
            bc, bd, cd = mid(b, c), mid(b, dd), mid(c, dd)
            # 4 corner tets + central octahedron split along the ac-bd
            # diagonal (Bey's red refinement).
            new_elements += [
                (a, ab, ac, ad), (ab, b, bc, bd),
                (ac, bc, c, cd), (ad, bd, cd, dd),
                (ab, ac, ad, bd), (ab, ac, bc, bd),
                (ac, ad, bd, cd), (ac, bc, bd, cd),
            ]
    else:
        raise ValueError("only triangles and tetrahedra are supported")

    return MeshLevel(nodes=nodes,
                     elements=np.asarray(new_elements, dtype=np.int64),
                     edge_parents=edges)


def structured_triangle_mesh(nx: int, ny: int) -> MeshLevel:
    """Convenience root mesh: an (nx x ny)-vertex unit square split into
    triangles (two per cell)."""
    xs, ys = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny),
                         indexing="ij")
    nodes = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=1)

    def nid(i, j):
        return i * ny + j

    elements = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b = nid(i, j), nid(i + 1, j)
            c, d = nid(i + 1, j + 1), nid(i, j + 1)
            elements += [(a, b, c), (a, c, d)]
    return MeshLevel(nodes=nodes,
                     elements=np.asarray(elements, dtype=np.int64))


def structured_tet_mesh(n: Tuple[int, int, int]) -> MeshLevel:
    """Unit-cube root mesh: each hex cell split into 6 tetrahedra."""
    nx, ny, nz = n
    ax = [np.linspace(0, 1, k) for k in (nx, ny, nz)]
    xs, ys, zs = np.meshgrid(*ax, indexing="ij")
    nodes = np.stack([xs.reshape(-1), ys.reshape(-1), zs.reshape(-1)],
                     axis=1)

    def nid(i, j, k):
        return (i * ny + j) * nz + k

    elements = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                v = [nid(i + di, j + dj, k + dk)
                     for di in (0, 1) for dj in (0, 1) for dk in (0, 1)]
                # 6-tet (Kuhn) split of the cube [v0..v7], bit order zyx
                for path in ((1, 3, 7), (1, 5, 7), (2, 3, 7),
                             (2, 6, 7), (4, 5, 7), (4, 6, 7)):
                    elements.append((v[0], v[path[0]], v[path[1]],
                                     v[path[2]]))
    return MeshLevel(nodes=nodes,
                     elements=np.asarray(elements, dtype=np.int64))


def load_msh(path) -> MeshLevel:
    """Load a Gmsh 2.2 ASCII ``.msh`` file as a :class:`MeshLevel`.

    Reads the $Nodes and $Elements sections; keeps the highest-dimension
    simplices present (type 4 tetrahedra, else type 2 triangles) and
    drops lower-dimensional boundary elements, renumbering nodes
    densely.  This covers the reference's unstructured test fixtures
    (/root/reference/tests/meshes/*.msh, loaded there via MOAB).
    """
    nodes = {}
    tris = []
    tets = []
    with open(path) as f:
        lines = iter(f.read().splitlines())
    for line in lines:
        tok = line.strip()
        if tok == "$Nodes":
            count = int(next(lines))
            for _ in range(count):
                parts = next(lines).split()
                nodes[int(parts[0])] = [float(x) for x in parts[1:4]]
        elif tok == "$Elements":
            count = int(next(lines))
            for _ in range(count):
                parts = next(lines).split()
                etype = int(parts[1])
                ntags = int(parts[2])
                conn = [int(x) for x in parts[3 + ntags:]]
                if etype == 2:
                    tris.append(conn)
                elif etype == 4:
                    tets.append(conn)
    elements = tets if tets else tris
    if not elements:
        raise ValueError(f"{path}: no triangles or tetrahedra found")
    used = sorted({i for el in elements for i in el})
    renum = {i: k for k, i in enumerate(used)}
    coords = np.asarray([nodes[i] for i in used], dtype=np.float64)
    conn = np.asarray([[renum[i] for i in el] for el in elements],
                      dtype=np.int64)
    return MeshLevel(coords, conn)
