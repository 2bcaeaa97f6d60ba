"""Host-side chemistry evaluation: stability, ring->atom conversion, validity.

Mirrors the reference evaluation layer (analyze/analyze.py, data/gor2goa.py,
data/xyz2mol.py) with two design changes:

- the geometric checks are vectorized numpy over whole batches instead of
  per-pair Python loops;
- chemical validity has a pure-python backend (Kekule perfect matching +
  valence accounting + Weisfeiler-Lehman canonical hashing) so the framework
  runs without RDKit; when RDKit is importable it is used for InChI-level
  parity with the reference.
"""

from gaudi_tpu.eval_chem.stability import (
    analyze_validity_for_molecules,
    check_stability,
    positions2adj,
)
from gaudi_tpu.eval_chem.gor2goa import gor2goa
from gaudi_tpu.eval_chem.valence import molecule_hash, valence_valid
from gaudi_tpu.eval_chem.metrics import analyze_chemical_validity_for_molecules

__all__ = [
    "analyze_validity_for_molecules",
    "check_stability",
    "positions2adj",
    "gor2goa",
    "valence_valid",
    "molecule_hash",
    "analyze_chemical_validity_for_molecules",
]
