"""Batch chemical-validity metrics: valid%, unique%, novelty%.

Equivalent of reference analyze/analyze.py:180-231
(analyze_rdkit_validity_for_molecules), with the backend chosen by
availability: RDKit InChI when importable, else the pure-python valence/WL
backend (gaudi_tpu.eval_chem.valence). Parallelized over a process pool —
the reference runs the conversion serially under tqdm, which dominates
wall-clock for 1k+ molecules.
"""

from __future__ import annotations

from concurrent.futures import ProcessPoolExecutor

import numpy as np

from gaudi_tpu.eval_chem.gor2goa import gor2goa
from gaudi_tpu.eval_chem.valence import molecule_hash, try_rdkit_inchi, valence_valid


def _judge_one(args):
    x, ring_types, dataset, tol = args
    try:
        _, atom_types, bonds = gor2goa(x, ring_types, dataset=dataset, tol=tol)
        inchi = try_rdkit_inchi(atom_types, bonds, dataset)
        if inchi is not None:
            return True, inchi
        if valence_valid(atom_types, bonds, dataset):
            return True, molecule_hash(atom_types, bonds, dataset)
        return False, None
    except Exception:
        return False, None


def analyze_chemical_validity_for_molecules(
    molecule_list,
    tol: float = 0.1,
    dataset: str = "cata",
    train_identities=None,
    n_workers: int = 0,
):
    """molecule_list: [(positions [N,3], ring_types [N])] -> metrics dict.

    Returns mol_valid, mol_unique, molecule_valid_bool, valid_identity
    (InChI or WL hash), and mol_novel when train_identities is given —
    mirroring reference analyze/analyze.py:180-231.
    """
    jobs = [
        (np.asarray(x), np.asarray(t), dataset, tol) for x, t in molecule_list
    ]
    if n_workers and len(jobs) > 32:
        with ProcessPoolExecutor(max_workers=n_workers) as pool:
            results = list(pool.map(_judge_one, jobs, chunksize=16))
    else:
        results = [_judge_one(j) for j in jobs]

    valid_bool = [ok for ok, _ in results]
    identities = [ident for ok, ident in results if ok and ident is not None]
    n = max(len(molecule_list), 1)
    out = {
        "mol_valid": sum(valid_bool) / float(n),
        "mol_unique": len(set(identities)) / max(len(identities), 1),
        "molecule_valid_bool": valid_bool,
        "valid_identity": identities,
    }
    if train_identities is not None:
        novel = set(identities) - set(train_identities)
        out["mol_novel"] = len(novel) / max(len(identities), 1)
    return out
