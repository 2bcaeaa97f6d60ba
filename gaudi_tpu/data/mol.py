"""Array-first molecule container and xyz parsing.

Replaces the reference's per-atom object model (data/mol.py:108-267 `Mol` /
`Atom` classes with Python-loop geometry) with plain numpy arrays: a molecule
is (elements: list[str], coords: [N, 3] float64). All geometry (connectivity,
inertia alignment) is vectorized numpy; the O(N^2) Python loops of the
reference (utils/molgraph.py:37-80) become single array expressions.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gaudi_tpu.data.periodic import ATOM_SYMBOLS, radii_vector


@dataclasses.dataclass
class Molecule:
    """elements[i] is the symbol of atom i; coords is [N, 3] Angstrom."""

    elements: list
    coords: np.ndarray

    def __len__(self) -> int:
        return len(self.elements)

    def without_hydrogens(self) -> "Molecule":
        keep = [i for i, e in enumerate(self.elements) if e != "H"]
        return Molecule(
            [self.elements[i] for i in keep], self.coords[keep].copy()
        )


def load_xyz(path: str) -> Molecule:
    """Parse a standard .xyz file (count line, comment line, atom lines).

    Accepts either element symbols or atomic numbers in the first column,
    like the reference parser (data/mol.py:202-229).
    """
    elements, coords = [], []
    with open(path) as f:
        for ln, line in enumerate(f):
            if ln < 2:
                continue
            parts = line.split()
            if len(parts) < 4:
                continue
            sym = parts[0]
            if not sym.isalpha():
                sym = ATOM_SYMBOLS[int(sym) - 1]
            elements.append(sym.capitalize())
            coords.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return Molecule(elements, np.asarray(coords, dtype=np.float64))


def save_xyz(path: str, mol: Molecule, comment: str = "") -> None:
    with open(path, "w") as f:
        f.write(f"{len(mol)}\n{comment}\n")
        for e, (x, y, z) in zip(mol.elements, mol.coords):
            f.write(f"{e} {x:.6f} {y:.6f} {z:.6f}\n")


def connectivity_matrix(
    mol: Molecule, covalency_factor: float = 1.3, skip_hydrogen: bool = False
) -> np.ndarray:
    """Bond adjacency: d(i,j) <= (r_i + r_j) * factor, vectorized.

    Matches reference utils/molgraph.py:37-80 (including the skip_hydrogen
    behavior of zeroing H rows/cols rather than removing atoms).
    """
    n = len(mol)
    r = radii_vector(mol.elements)
    cutoff = (r[:, None] + r[None, :]) * covalency_factor
    diff = mol.coords[:, None, :] - mol.coords[None, :, :]
    dist = np.sqrt((diff**2).sum(-1))
    adj = (dist <= cutoff).astype(np.int8)
    np.fill_diagonal(adj, 0)
    if skip_hydrogen:
        is_h = np.array([e == "H" for e in mol.elements])
        adj[is_h, :] = 0
        adj[:, is_h] = 0
    return adj


def align_to_xy_plane(coords: np.ndarray) -> np.ndarray:
    """Rotate a point cloud so its principal plane is the xy-plane.

    Inertia-tensor eigenbasis transform; reproduces the reference's
    convention (data/mol.py:129-165) including its com = sum/3 quirk
    (divides by coordinate dimension, not atom count — a faithful
    reproduction matters only for exact-parity tests; the rotation is
    identical either way up to translation).
    """
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    inertia = np.array(
        [
            [np.sum(y**2 + z**2), -np.sum(x * y), -np.sum(x * z)],
            [-np.sum(x * y), np.sum(x**2 + z**2), -np.sum(y * z)],
            [-np.sum(x * z), -np.sum(y * z), np.sum(x**2 + y**2)],
        ]
    )
    com = coords.sum(0) / 3.0
    eigvecs = np.linalg.eigh(inertia)[1]
    return (coords - com) @ eigvecs
