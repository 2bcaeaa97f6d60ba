"""Chemical validity without RDKit: valence accounting + Kekule matching.

The reference pipes generated atom graphs through vendored xyz2mol
(data/xyz2mol.py:538-679, valence enumeration over bond orders) plus RDKit
sanitization (data/gor2goa.py:298-324). Neither RDKit nor its InChI machinery
is available in this image, so validity is decided by the equivalent
graph-theoretic criterion for the neutral aromatic systems at hand:

1. implicit hydrogens: every degree-2 carbon gets one H (the reference adds
   them explicitly before xyz2mol, gor2goa.py:288-293);
2. every atom's remaining valence (allowed valence - sigma degree) must be
   0 or 1;
3. the atoms with remaining valence 1 must admit a perfect matching within
   the bond graph (a Kekule structure: each leftover valence saturated by
   one double bond). This is exactly the neutral, charge-free core of
   xyz2mol's AC2BO search.
4. single connected fragment (reference GetMolFrags check, gor2goa.py:315).

Identity for uniqueness/novelty is a Weisfeiler-Lehman graph hash with
element+implicit-H node labels — a canonical-form stand-in for InChI. When
RDKit *is* importable, metrics.py upgrades to real InChIs automatically.
"""

from __future__ import annotations

import networkx as nx
import numpy as np

from gaudi_tpu.data.periodic import ATOM_VALENCES
from gaudi_tpu.data.rings import ATOMS_LIST


def _build_graph(atom_types, bonds, dataset: str) -> nx.Graph:
    """Atom-index graph with element labels + implicit H counts."""
    symbols = [ATOMS_LIST[dataset][int(t)] for t in atom_types]
    g = nx.Graph()
    for i, s in enumerate(symbols):
        g.add_node(i, element=s)
    for a, b in bonds:
        g.add_edge(int(a), int(b))
    # implicit H on degree-2 carbons (reference build_molecule_aromatic,
    # gor2goa.py:288-293)
    for i, s in enumerate(symbols):
        h = 0
        if s == "C" and g.degree(i) == 2:
            h = 1
        g.nodes[i]["implicit_h"] = h
    return g


def _expanded_ac(atom_types, bonds, dataset: str):
    """(AC matrix, symbols) with explicit H added on degree-2 carbons —
    exactly the mol the reference feeds AC2mol (build_molecule_aromatic,
    gor2goa.py:276-296)."""
    symbols = [ATOMS_LIST[dataset][int(t)] for t in atom_types]
    n = len(symbols)
    deg = np.zeros(n, np.int64)
    for a, b in bonds:
        deg[int(a)] += 1
        deg[int(b)] += 1
    extra = [i for i, s in enumerate(symbols) if s == "C" and deg[i] == 2]
    m = n + len(extra)
    ac = np.zeros((m, m), np.int64)
    for a, b in bonds:
        ac[int(a), int(b)] = ac[int(b), int(a)] = 1
    for k, i in enumerate(extra):
        ac[i, n + k] = ac[n + k, i] = 1
        symbols.append("H")
    return ac, symbols


def valence_valid(atom_types, bonds, dataset: str = "cata") -> bool:
    """True iff the atom graph is a chemically valid neutral molecule.

    Full AC2BO criterion (see xyz2mol_bo): a valence assignment whose
    saturated bond-order matrix passes the sum + charge checks must exist
    AND assign formal charge 0 to every atom; plus the reference's
    single-fragment requirement (gor2goa.py:315).
    """
    if len(atom_types) == 0 or len(bonds) == 0:
        return False
    g = _build_graph(atom_types, bonds, dataset)
    if not nx.is_connected(g):
        return False
    from gaudi_tpu.eval_chem.xyz2mol_bo import bo_is_neutral_valid

    ac, symbols = _expanded_ac(atom_types, bonds, dataset)
    valid, _ = bo_is_neutral_valid(ac, symbols, 0)
    return valid


def molecule_hash(atom_types, bonds, dataset: str = "cata") -> str:
    """Canonical identity string (WL hash over element/implicit-H labels)."""
    g = _build_graph(atom_types, bonds, dataset)
    for i in g.nodes:
        g.nodes[i]["label"] = f"{g.nodes[i]['element']}H{g.nodes[i]['implicit_h']}"
    return nx.weisfeiler_lehman_graph_hash(g, node_attr="label", iterations=4)


_RDKIT_CHEM = None  # cached module or False; re-importing on every call is slow


def rdkit_chem():
    """rdkit.Chem when importable (cached), else None."""
    global _RDKIT_CHEM
    if _RDKIT_CHEM is None:
        try:
            from rdkit import Chem

            _RDKIT_CHEM = Chem
        except ImportError:
            _RDKIT_CHEM = False
    return _RDKIT_CHEM or None


def try_rdkit_inchi(atom_types, bonds, dataset: str = "cata"):
    """InChI via RDKit when importable; None if RDKit is absent or fails.

    Mirrors reference rdkit_valid (gor2goa.py:298-324): explicit H on
    degree-2 carbons, then AC2mol-style bond-order inference (the BO
    matrix our ac2bo derives is the one the reference's xyz2mol.AC2BO
    returns) rather than direct aromatic sanitization, then SanitizeMol +
    single-fragment check.
    """
    Chem = rdkit_chem()
    if Chem is None:
        return None
    try:
        from gaudi_tpu.eval_chem.xyz2mol_bo import bo_is_neutral_valid

        ac, symbols = _expanded_ac(atom_types, bonds, dataset)
        valid, bo = bo_is_neutral_valid(ac, symbols, 0)
        if not valid:
            return None
        order = {
            1: Chem.rdchem.BondType.SINGLE,
            2: Chem.rdchem.BondType.DOUBLE,
            3: Chem.rdchem.BondType.TRIPLE,
        }
        mol = Chem.RWMol()
        for s in symbols:
            mol.AddAtom(Chem.Atom(s))
        n = len(symbols)
        for i in range(n):
            for j in range(i + 1, n):
                if bo[i, j]:
                    mol.AddBond(i, j, order[int(bo[i, j])])
        m = mol.GetMol()
        Chem.SanitizeMol(m)
        if len(Chem.GetMolFrags(m, asMols=True)) != 1:
            return None
        return Chem.MolToInchi(m)
    except Exception:
        return None
