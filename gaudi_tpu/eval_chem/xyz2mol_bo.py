"""Bond-order inference from atomic connectivity (AC2BO equivalent).

The reference judges chemical validity by piping the reconstructed atom
graph through vendored xyz2mol's `AC2mol` (reference data/gor2goa.py:298-324
-> data/xyz2mol.py:538-679): enumerate per-atom valence assignments,
saturate unsaturated atoms with a maximum matching, and accept the first
bond-order matrix whose total formal charge equals the target. This module
is a from-scratch implementation of that algorithm (Kim & Kim, Bull. Korean
Chem. Soc. 2015, 36, 1769 — the paper xyz2mol implements) with the same
observable semantics:

- per-element candidate valence lists IN THE REFERENCE'S ORDER
  (xyz2mol.py:136-150) — order matters because the first status-OK
  assignment wins (e.g. S tries hexavalence before divalence);
- unsaturated-atom pairing by maximum matching (use_graph=True path,
  xyz2mol.py:509-520), iterated to a fixed point (get_BO, xyz2mol.py:197-214);
- acceptance = valences not exceeded AND (BO - AC).sum() == sum(DU) AND
  total formal charge == target, with the reference's carbene special
  cases (charge_is_OK / get_atomic_charge, xyz2mol.py:225-257, :302-318);
- on failure, the densest charge-consistent BO is returned as a fallback
  (best_BO, xyz2mol.py:616-631).

Validity semantics downstream (see `bo_is_neutral_valid`): the reference's
AC2mol returns [] when the built mol's formal charge differs from the
target, and `rdkit_valid` additionally requires the ResonanceMolSupplier
to yield exactly one structure plus a clean SanitizeMol and a single
fragment. For the neutral closed-shell aromatics this framework targets,
"exactly one resonance structure" is equivalent to "the accepted BO
assigns formal charge 0 to every atom" (charge-separated assignments
always admit >1 charge-shifted resonance forms under
UNCONSTRAINED_CATIONS/ANIONS); we use that as the resonance criterion
since RDKit is not available in this image.

Not rebuilt (documented divergences from the vendored file):
- radical assignment (set_atomic_radicals, xyz2mol.py:477-494) — only
  reachable with allow_charged_fragments=False, which the reference's
  validity path never uses;
- the Hueckel AC builder (xyz2mol.py:721-788) — requires rdEHTTools,
  optional in the reference itself; `ac_from_coords` provides the
  covalent-radii builder which is what the live path uses.
"""

from __future__ import annotations

import itertools
from typing import Optional

import numpy as np

# Candidate valences per element, reference order (xyz2mol.py:136-150).
ATOMIC_VALENCE = {
    "H": [1],
    "B": [3, 4],
    "C": [4],
    "N": [3, 4],
    "O": [2, 1, 3],
    "F": [1],
    "Si": [4],
    "P": [5, 3],
    "S": [6, 3, 2],
    "Cl": [1],
    "Br": [1],
    "I": [1],
}

# Valence electrons (xyz2mol.py:152-165).
VALENCE_ELECTRONS = {
    "H": 1, "B": 3, "C": 4, "N": 5, "O": 6, "F": 7,
    "Si": 4, "P": 5, "S": 6, "Cl": 7, "Br": 7, "I": 7,
}

# Hard cap on the valence-combination enumeration. The reference's
# itertools.product is unbounded (exponential in hetero-atom count for
# invalid molecules); 2^16 covers every molecule this pipeline can emit
# (<= 20 B/N sites and invalid ones fail far earlier).
MAX_COMBOS = 65536


def _atomic_charge(symbol: str, bo_valence: int) -> int:
    """Formal charge of one atom given its total bond order
    (xyz2mol.py:302-318)."""
    if symbol == "H":
        return 1 - bo_valence
    if symbol == "B":
        return 3 - bo_valence
    if symbol == "P" and bo_valence == 5:
        return 0
    if symbol == "S" and bo_valence == 6:
        return 0
    return VALENCE_ELECTRONS[symbol] - 8 + bo_valence


def _charges(symbols, bo, target_charge: int) -> np.ndarray:
    """Per-atom formal charges incl. the reference's carbene adjustments
    (set_atomic_charges, xyz2mol.py:443-474)."""
    bo_val = bo.sum(axis=1)
    out = np.zeros(len(symbols), np.int64)
    q = 0
    for i, s in enumerate(symbols):
        c = _atomic_charge(s, int(bo_val[i]))
        q += c
        if s == "C":
            singles = int((bo[i] == 1).sum())
            if singles == 2 and bo_val[i] == 2:
                q += 1
                c = 0
            if singles == 3 and q + 1 < target_charge:
                q += 2
                c = 1
        out[i] = c
    return out


def _total_charge(symbols, bo, target_charge: int) -> int:
    """Total charge as charge_is_OK computes it (xyz2mol.py:225-250) —
    note its carbene bookkeeping differs slightly from _charges: the
    adjusted q counts +2/+1 into the total."""
    bo_val = bo.sum(axis=1)
    q = 0
    for i, s in enumerate(symbols):
        c = _atomic_charge(s, int(bo_val[i]))
        q += c
        if s == "C":
            singles = int((bo[i] == 1).sum())
            if singles == 2 and bo_val[i] == 2:
                q += 1
            if singles == 3 and q + 1 < target_charge:
                q += 2
    return q


def _get_ua(valences, bo_valences):
    ua, du = [], []
    for i, (v, bv) in enumerate(zip(valences, bo_valences)):
        if v - bv > 0:
            ua.append(i)
            du.append(v - bv)
    return ua, du


def _max_matching_pairs(ua, ac) -> list:
    """Maximum matching over AC-adjacent unsaturated-atom pairs
    (get_UA_pairs use_graph path, xyz2mol.py:509-520)."""
    import networkx as nx

    g = nx.Graph()
    for k, i in enumerate(ua):
        for j in ua[k + 1:]:
            if ac[i, j]:
                g.add_edge(i, j)
    if g.number_of_edges() == 0:
        return []
    return list(nx.max_weight_matching(g))


def _get_bo(ac, ua, du, valences, pairs):
    """Iterated saturation to a fixed point (get_BO, xyz2mol.py:197-214):
    terminate as soon as a round leaves the degree-of-unsaturation list
    unchanged (the first round compares against the incoming DU)."""
    bo = ac.copy()
    du = list(du)
    du_save = []
    while du_save != du:
        for i, j in pairs:
            bo[i, j] += 1
            bo[j, i] += 1
        bo_val = list(bo.sum(axis=1))
        du_save = list(du)
        ua, du = _get_ua(valences, bo_val)
        pairs = _max_matching_pairs(ua, ac)
    return bo


def ac2bo(ac: np.ndarray, symbols, charge: int = 0):
    """AC [n,n] 0/1, element symbols -> (BO [n,n] int, status_ok: bool).

    Faithful re-derivation of reference AC2BO (xyz2mol.py:538-633):
    returns the first valence assignment whose saturated BO passes the
    sum + charge checks, else the densest charge-consistent fallback.
    """
    ac = np.asarray(ac, np.int64)
    n = len(symbols)
    ac_val = ac.sum(axis=1)

    per_atom = []
    for i, s in enumerate(symbols):
        allowed = ATOMIC_VALENCE.get(s)
        if allowed is None:
            return ac, False
        poss = [v for v in allowed if v >= ac_val[i]]
        if not poss:
            # reference sys.exit()s here; a judge must not
            return ac, False
        per_atom.append(poss)

    best_bo = ac.copy()
    for combo_i, valences in enumerate(itertools.product(*per_atom)):
        if combo_i >= MAX_COMBOS:
            break
        ua, du_from_ac = _get_ua(valences, list(ac_val))
        if not ua:
            if (ac.sum(axis=1) <= np.array(valences)).all() and _total_charge(
                symbols, ac, charge
            ) == charge:
                return ac, True
            continue
        pairs = _max_matching_pairs(ua, ac)
        bo = _get_bo(ac, ua, du_from_ac, list(valences), pairs)
        not_too_large = (bo.sum(axis=1) <= np.array(valences)).all()
        sum_ok = (bo - ac).sum() == sum(du_from_ac)
        charge_ok = _total_charge(symbols, bo, charge) == charge
        if not_too_large and sum_ok and charge_ok:
            return bo, True
        if bo.sum() >= best_bo.sum() and not_too_large and charge_ok:
            best_bo = bo.copy()
    return best_bo, False


def bo_is_neutral_valid(ac, symbols, charge: int = 0):
    """Reference `rdkit_valid` verdict for one molecule, minus RDKit.

    (sum/charge-accepted BO exists) AND (every atom's formal charge is 0,
    the resonance-supplier-==1 criterion for this chemistry). Fragment
    connectivity is checked by callers. Returns (valid, BO or None).
    """
    bo, ok = ac2bo(ac, symbols, charge)
    if not ok:
        return False, None
    ch = _charges(symbols, bo, charge)
    if int(ch.sum()) != charge or (ch != 0).any():
        return False, None
    return True, bo


def ac_from_coords(symbols, coords, covalency_factor: float = 1.3):
    """AC matrix from 3-D coordinates via covalent radii — the xyz2mol
    entry path (get_AC, xyz2mol.py:791-845 uses RDKit's Rcovalent with
    factor 1.3; same criterion as utils/molgraph.py:37-80)."""
    from gaudi_tpu.data.periodic import radii_vector

    coords = np.asarray(coords, np.float64)
    r = radii_vector(list(symbols))
    cutoff = (r[:, None] + r[None, :]) * covalency_factor
    d = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    ac = (d <= cutoff).astype(np.int64)
    np.fill_diagonal(ac, 0)
    return ac


def xyz2mol_graph(symbols, coords, charge: int = 0):
    """xyz -> (AC, BO, formal charges, valid) — the full xyz2mol pipeline
    shape (xyz2mol.py:863-905) without the RDKit mol object."""
    ac = ac_from_coords(symbols, coords)
    bo, ok = ac2bo(ac, symbols, charge)
    return ac, bo, _charges(symbols, bo, charge), ok
