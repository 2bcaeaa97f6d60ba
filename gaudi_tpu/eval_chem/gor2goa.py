"""Graph-of-rings -> graph-of-atoms (GOR -> GOA) back-conversion.

Rebuild of reference data/gor2goa.py:18-261. Each generated ring node is
expanded to a template polygon (real furan/benzene ring geometries, below),
rotated so its orientation handle points at the recorded orientation node
(hetro) or its first fused neighbor (Bn/Cbd); fusion-bonded ring pairs then
share two atoms, found here by closest-pair matching and contracted with a
union-find (the reference uses center-line side tests; closest-pair is
equivalent on clean geometry and degrades more gracefully on noisy samples).

Returns (atom_positions [M, 2], atom_type_indices, bonds) with types indexed
into ATOMS_LIST[dataset] — exactly the reference's output contract.
"""

from __future__ import annotations

import numpy as np

from gaudi_tpu.data.mol import align_to_xy_plane
from gaudi_tpu.data.rings import ATOMS_LIST, NO_ORIENTATION_RINGS, RINGS_DICT, RINGS_LIST
from gaudi_tpu.eval_chem.stability import positions2adj

# Template ring geometries (reference data/gor2goa.py:18-51): vertex k of the
# hexagon sits at angle -(k+1)*60 deg, so index 5 (the heteroatom slot of
# CCCCCN-type strings) is at angle 0; the pentagon/square templates are the
# measured furan/cyclobutadiene shapes with the heteroatom slot at angle 0.
_HEXAGON = np.array(
    [
        [0.692302547, -1.19910074],
        [-0.692299212, -1.19910016],
        [-1.38459997, 0.0],
        [-0.692301879, 1.19910117],
        [0.692298556, 1.19910064],
        [1.3846, 0.0],
    ]
)
_PENTAGON = np.array(
    [[0.3, -1.229], [-0.943, -0.743], [-0.943, 0.742], [0.3, 1.229], [1.286, 0.0]]
)
_SQUARE = np.array(
    [[0.0, 0.947523087], [-0.947523087, 0.0], [0.0, -0.947523087], [0.947523087, 0.0]]
)
RING_TEMPLATES = {
    "Bn": _HEXAGON, "Bz": _HEXAGON, "Pd": _HEXAGON, "Pz": _HEXAGON,
    "Db": _HEXAGON, "DhDb": _HEXAGON,
    "Th": _PENTAGON, "Fu": _PENTAGON, "Bl": _PENTAGON, "Pl": _PENTAGON,
    "Cbd": _SQUARE,
}


def _rot2d(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s], [s, c]])


class _UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, a: int) -> int:
        while self.parent[a] != a:
            self.parent[a] = self.parent[self.parent[a]]
            a = self.parent[a]
        return a

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def gor2goa(x: np.ndarray, ring_types: np.ndarray, dataset: str = "cata", tol: float = 0.1):
    """Expand a ring graph to an atom graph.

    x: [N', 3] ring-node coordinates (N' includes orientation nodes for
    hetro); ring_types: [N'] ints into RINGS_LIST[dataset].

    Dispatches to the native C++ implementation (gaudi_tpu.native.gor2goa,
    property-tested to produce identical atom graphs) when available;
    `gor2goa_py` is the always-available pure-python path.
    """
    from gaudi_tpu import native

    if native.available():
        return native.gor2goa(x, ring_types, dataset, tol)
    return gor2goa_py(x, ring_types, dataset, tol)


def gor2goa_py(
    x: np.ndarray, ring_types: np.ndarray, dataset: str = "cata", tol: float = 0.1
):
    """Pure-python GOR->GOA (reference data/gor2goa.py:133-261 rebuild)."""
    x = np.asarray(x, np.float64)
    ring_types = np.asarray(ring_types, np.int64)
    n = x.shape[0] // 2 if dataset == "hetro" else x.shape[0]

    _, adj = positions2adj(x[None, :n], ring_types[None, :n], dataset=dataset, tol=tol)
    adj = adj[0]

    xy = align_to_xy_plane(x)[:, :2]
    orientation = xy[n:]
    xy = xy[:n]

    names = RINGS_LIST[dataset]
    atoms = []  # [M, 2] positions
    atom_elems = []  # element symbols
    bonds = []
    ring_atom_idx = []

    for i in range(n):
        rname = names[int(ring_types[i])]
        template = RING_TEMPLATES[rname].copy()
        if rname in NO_ORIENTATION_RINGS:
            neigh = np.nonzero(adj[i])[0]
            if len(neigh) == 0:
                angle = 0.0
            else:
                # anchor to the symmetry-periodic circular mean over ALL
                # neighbors: rotating an all-C hexagon (square) template by
                # 60 (90) degrees maps it onto itself, so only the angle
                # mod the period matters — averaging over neighbors is
                # ring-order-invariant (a single-neighbor anchor made the
                # reconstruction depend on cycle-basis enumeration order)
                # and tolerant of out-of-plane distortion
                period = np.pi / 3 if rname == "Bn" else np.pi / 2
                th = np.arctan2(
                    xy[neigh, 1] - xy[i, 1], xy[neigh, 0] - xy[i, 0]
                )
                m = 2.0 * np.pi / period
                angle = np.arctan2(
                    np.sin(m * th).sum(), np.cos(m * th).sum()
                ) / m
            # offset so an edge midpoint (not a vertex) faces the neighbor
            angle += np.pi / 6 if rname == "Bn" else np.pi / 4
        else:
            o = orientation[i]
            angle = np.arctan2(o[1] - xy[i, 1], o[0] - xy[i, 0])

        ring = template @ _rot2d(-angle) + xy[i]
        s = len(atoms)
        k = ring.shape[0]
        ring_atom_idx.append(list(range(s, s + k)))
        atoms.extend(ring)
        atom_elems.extend(RINGS_DICT[rname])
        bonds.extend([(s + a, s + (a + 1) % k) for a in range(k)])

        # explicit hydrogens the implicit-H rule below can't infer:
        # N-H of pyrrole / B-H of borole (slot 4), both B-H of DhDb (2, 5)
        h_slots = {"Bl": [4], "Pl": [4], "DhDb": [2, 5]}.get(rname, [])
        for slot in h_slots:
            hpos = ring[slot] + (ring[slot] - xy[i]) * 0.4
            bonds.append((s + slot, len(atoms)))
            atoms.append(hpos)
            atom_elems.append("H")

    atoms = np.asarray(atoms)

    # contract fusion-shared atoms: for each fused ring pair take the two
    # closest inter-ring atom pairs (the shared bond) and union them
    uf = _UnionFind(len(atoms))
    for i in range(n):
        for j in range(i + 1, n):
            if not adj[i, j]:
                continue
            ai = np.asarray(ring_atom_idx[i])
            aj = np.asarray(ring_atom_idx[j])
            d = np.linalg.norm(atoms[ai][:, None] - atoms[aj][None], axis=-1)
            # stable sort: exactly-tied distances (ideal lattice geometry)
            # must break ties by (pi, pj) like the native C++ sort, or the
            # two backends can contract different atom pairs
            flat = np.argsort(d, axis=None, kind="stable")
            picked_i, picked_j = set(), set()
            for f in flat:
                pi, pj = divmod(int(f), d.shape[1])
                if pi in picked_i or pj in picked_j:
                    continue
                uf.union(int(ai[pi]), int(aj[pj]))
                picked_i.add(pi)
                picked_j.add(pj)
                if len(picked_i) == 2:
                    break

    # collapse union-find classes: averaged position, representative element
    groups = {}
    for a in range(len(atoms)):
        groups.setdefault(uf.find(a), []).append(a)
    new_index = {}
    out_pos, out_elems = [], []
    for root, members in groups.items():
        idx = len(out_pos)
        for m in members:
            new_index[m] = idx
        # groups are almost always singletons or fused pairs; plain
        # arithmetic avoids ~40 numpy-mean dispatches per molecule
        if len(members) == 1:
            out_pos.append(atoms[members[0]])
        else:
            out_pos.append(sum(atoms[m] for m in members) / len(members))
        out_elems.append(atom_elems[members[0]])
    out_bonds = {tuple(sorted((new_index[a], new_index[b]))) for a, b in bonds}
    out_bonds = [list(b) for b in sorted(out_bonds) if b[0] != b[1]]

    atom_list = ATOMS_LIST[dataset]
    type_idx = [atom_list.index(e) for e in out_elems]
    return np.asarray(out_pos), np.asarray(type_idx, np.int64), out_bonds
