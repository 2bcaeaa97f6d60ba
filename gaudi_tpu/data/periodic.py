"""Periodic-table constants: symbols, covalent radii, valences.

Physical-constant tables (Cordero et al. 2008 covalent radii), the same public
data the reference vendors in utils/const.py:100-199 and data/mol.py:8-103.
Only the elements reachable by the aromatic datasets are included; extend as
needed.
"""

from __future__ import annotations

import numpy as np

# Atomic number -> symbol for the low-Z block (index = Z - 1).
ATOM_SYMBOLS = [
    "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca",
    "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Ga", "Ge", "As", "Se", "Br", "Kr",
]

SYMBOL_TO_Z = {s: i + 1 for i, s in enumerate(ATOM_SYMBOLS)}

# Single-bond covalent radii in Angstrom (Cordero et al., Dalton Trans. 2008).
COVALENT_RADII = {
    "H": 0.31, "He": 0.28, "Li": 1.28, "Be": 0.96, "B": 0.84,
    "C": 0.76, "N": 0.71, "O": 0.66, "F": 0.57, "Ne": 0.58,
    "Na": 1.66, "Mg": 1.41, "Al": 1.21, "Si": 1.11, "P": 1.07,
    "S": 1.05, "Cl": 1.02, "Ar": 1.06, "K": 2.03, "Ca": 1.76,
    "Br": 1.20, "Se": 1.20, "As": 1.19, "Ge": 1.20, "Ga": 1.22,
}

# Standard valences for the pure-python bond-order/validity checker
# (fallback for the reference's RDKit+xyz2mol path, data/xyz2mol.py:46-90).
# Multiple entries = allowed valence states (neutral).
ATOM_VALENCES = {
    "H": (1,),
    "B": (3,),
    "C": (4,),
    "N": (3,),
    "O": (2,),
    "F": (1,),
    "S": (2,),
    "Cl": (1,),
    "Br": (1,),
}


def radii_vector(elements: list[str]) -> np.ndarray:
    """Covalent radii for a list of element symbols -> [N] float array."""
    return np.array([COVALENT_RADII[e] for e in elements], dtype=np.float64)
