"""Ring-graph extraction: bonded atoms -> typed ring nodes with orientations.

Rebuild of the reference's ring machinery (data/ring.py, utils/ring_graph.py)
in array form. A ring graph is a tuple of numpy arrays instead of a list of
`Ring` objects:

    centers      [R, 3] float64  ring centroid coordinates
    ring_types   [R]    int      index into RINGS_LIST for the dataset
    adj          [R, R] int8     rings sharing >= 1 atom are connected
    orientations list[ [K_i, 3] ]  orientation-atom candidates per ring

Orientation semantics follow reference utils/ring_graph.py:75-88: rings with
no heteroatom anisotropy (Bn, Cbd) use their centroid; all others use the
coordinates of each non-carbon member atom.
"""

from __future__ import annotations

import dataclasses

import networkx as nx
import numpy as np

from gaudi_tpu.data.mol import Molecule, connectivity_matrix

# Ring type -> member element multiset (reference data/ring.py:6-18).
RINGS_DICT = {
    "Bn": "CCCCCC",  # benzene
    "Pl": "CCCCN",  # pyrrole
    "Bl": "CCCCB",  # borole
    "Fu": "CCCCO",  # furan
    "Th": "CCCCS",  # thiophene
    "Pd": "CCCCCN",  # pyridine-like
    "Pz": "CCNCCN",  # pyrazine-like
    "Bz": "CCCCCB",  # borabenzene
    "DhDb": "CCBCCB",  # dihydro-diborine
    "Db": "CCBCCB",  # diborine
    "Cbd": "CCCC",  # cyclobutadiene
}

# Rings whose orientation is just the centroid (no heteroatom handle).
NO_ORIENTATION_RINGS = ("Bn", "Cbd")

# Per-dataset ring vocabularies (reference data/aromatic_dataloader.py:31-35).
# 'hetro' appends "." as the extra class marking orientation pseudo-nodes.
RINGS_LIST = {
    "cata": ["Bn"],
    "peri": ["Bn"],
    "hetro": list(RINGS_DICT.keys()) + ["."],
}

# Per-dataset atom vocabularies (reference data/aromatic_dataloader.py:26-30).
ATOMS_LIST = {
    "cata": ["H", "C"],
    "peri": ["H", "C"],
    "hetro": ["H", "C", "B", "N", "O", "S"],
}


@dataclasses.dataclass
class RingGraph:
    centers: np.ndarray  # [R, 3]
    ring_types: np.ndarray  # [R] int (indices into RINGS_LIST[dataset])
    adj: np.ndarray  # [R, R] int8
    orientations: list  # R entries of [K_i, 3] arrays

    @property
    def n_rings(self) -> int:
        return self.centers.shape[0]


def ring_type_from_elements(elements: str) -> str:
    """Sorted element multiset -> ring-type key (utils/ring_graph.py:12-16)."""
    key = sorted(elements)
    for name, members in RINGS_DICT.items():
        if key == sorted(members):
            return name
    raise ValueError(f"unknown ring composition: {elements}")


def extract_ring_graph(mol: Molecule, dataset: str = "cata") -> RingGraph:
    """Molecule -> RingGraph via minimum cycle basis.

    Mirrors reference utils/ring_graph.py:38-93 + :120-128: hydrogens are
    excluded from the bond graph, each basis cycle becomes one ring node at
    the member-atom centroid, typed by element multiset; rings sharing atoms
    are adjacent. The Db/DhDb distinction checks whether the boron atom has
    an H neighbor in the full (H-included) bond graph.
    """
    adj_atoms = connectivity_matrix(mol, skip_hydrogen=True)
    g = nx.from_numpy_array(adj_atoms)
    g.remove_nodes_from(list(nx.isolates(g)))
    cycles = nx.minimum_cycle_basis(g)

    full_adj = None  # built lazily, only needed for Db/DhDb disambiguation
    names = RINGS_LIST[dataset]

    centers, types, orientations, members = [], [], [], []
    for cycle in cycles:
        elems = "".join(mol.elements[a] for a in cycle)
        center = mol.coords[cycle].mean(axis=0)
        tname = ring_type_from_elements(elems)
        if tname in ("Db", "DhDb"):
            if full_adj is None:
                full_adj = connectivity_matrix(mol, skip_hydrogen=False)
            b_atom = cycle[elems.index("B")]
            neigh = np.nonzero(full_adj[b_atom])[0]
            has_h = any(mol.elements[int(n)] == "H" for n in neigh)
            tname = "DhDb" if has_h else "Db"

        if tname in NO_ORIENTATION_RINGS:
            orient = center[None, :].copy()
        else:
            hetero = [a for a in cycle if mol.elements[a] != "C"]
            if not hetero:
                raise ValueError("no orientation atoms for ring " + tname)
            orient = mol.coords[hetero].copy()

        centers.append(center)
        types.append(names.index(tname))
        orientations.append(orient)
        members.append(set(cycle))

    r = len(centers)
    ring_adj = np.zeros((r, r), dtype=np.int8)
    for i in range(r):
        for j in range(i + 1, r):
            if members[i] & members[j]:
                ring_adj[i, j] = ring_adj[j, i] = 1

    return RingGraph(
        centers=np.asarray(centers, dtype=np.float64).reshape(r, 3),
        ring_types=np.asarray(types, dtype=np.int64),
        adj=ring_adj,
        orientations=orientations,
    )
