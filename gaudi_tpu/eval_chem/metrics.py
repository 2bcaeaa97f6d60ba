"""Batch chemical-validity metrics: valid%, unique%, novelty%.

Equivalent of reference analyze/analyze.py:180-231
(analyze_rdkit_validity_for_molecules), with the backend chosen by
availability:

1. RDKit InChI when importable (the reference's own backend);
2. the native C++ judge (gaudi_tpu.native: union-find connectivity,
   valence accounting, blossom Kekulé matching, WL identity hashing) —
   one batched call, no per-molecule Python;
3. the pure-python valence/WL backend (gaudi_tpu.eval_chem.valence).

The geometry stage (ring graph -> atom graph, gor2goa) runs per molecule,
over a process pool for large batches — the reference runs the whole
conversion serially under tqdm, which dominates wall-clock for 1k+
molecules.
"""

from __future__ import annotations

import multiprocessing as mp
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from gaudi_tpu.eval_chem.gor2goa import gor2goa
from gaudi_tpu.eval_chem.valence import (
    molecule_hash,
    rdkit_chem,
    try_rdkit_inchi,
    valence_valid,
)

# The parent process usually has JAX loaded (multithreaded); fork() of a
# multithreaded process can deadlock in the child (CPython emits a
# RuntimeWarning for exactly this). None of the worker-side modules import
# jax, so spawn workers start clean and cheap.
_MP_CTX = mp.get_context("spawn")


def _pool_map(fn, jobs, n_workers):
    """pool.map with a serial fallback.

    spawn re-executes the parent's __main__ in each worker; parents without
    an importable main module (REPL, stdin scripts) raise BrokenProcessPool
    — degrade to the serial path instead of crashing the eval.
    """
    from concurrent.futures.process import BrokenProcessPool

    try:
        with ProcessPoolExecutor(
            max_workers=n_workers, mp_context=_MP_CTX
        ) as pool:
            return list(pool.map(fn, jobs, chunksize=32))
    except BrokenProcessPool:
        return [fn(j) for j in jobs]


def _convert_one(args):
    """Geometry stage: ring graph -> (atom_types, bonds), None on failure."""
    x, ring_types, dataset, tol = args
    try:
        _, atom_types, bonds = gor2goa(x, ring_types, dataset=dataset, tol=tol)
        return atom_types, bonds
    except Exception:
        return None


def _judge_py(goa, dataset):
    """Python/RDKit fallback judge for one converted molecule."""
    atom_types, bonds = goa
    try:
        inchi = try_rdkit_inchi(atom_types, bonds, dataset)
        if inchi is not None:
            return True, inchi
        if valence_valid(atom_types, bonds, dataset):
            return True, molecule_hash(atom_types, bonds, dataset)
        return False, None
    except Exception:
        return False, None


def _convert_and_judge(args):
    """Fused geometry + python/RDKit judge stage, pool-friendly.

    Keeps the per-molecule InChI conversion inside the worker processes —
    judging serially in the parent reintroduces the serial-conversion
    bottleneck for 1k+ molecule batches when RDKit is present.
    """
    goa = _convert_one(args)
    if goa is None:
        return False, None
    return _judge_py(goa, args[2])


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
    n = len(molecule_list)
    valid_bool = [False] * n
    identity = [None] * n

    from gaudi_tpu import native

    use_native = rdkit_chem() is None and native.available()
    use_pool = n_workers and len(jobs) > 256
    if use_native:
        # geometry over the pool, then one batched native judge call
        if use_pool:
            goas = _pool_map(_convert_one, jobs, n_workers)
        else:
            goas = [_convert_one(j) for j in jobs]
        live = [i for i, g in enumerate(goas) if g is not None]
        ok, ids = native.judge_batch([goas[i] for i in live], dataset)
        for j, i in enumerate(live):
            valid_bool[i] = ok[j]
            identity[i] = ids[j]
    else:
        # python/RDKit judge is per-molecule: fuse it with the conversion
        # inside the workers so InChI generation parallelizes too
        if use_pool:
            judged = _pool_map(_convert_and_judge, jobs, n_workers)
        else:
            judged = [_convert_and_judge(j) for j in jobs]
        for i, (ok, ident) in enumerate(judged):
            valid_bool[i] = ok
            identity[i] = ident

    identities = [s for s in identity if s is not None]
    out = {
        "mol_valid": sum(valid_bool) / float(max(n, 1)),
        "mol_unique": len(set(identities)) / max(len(identities), 1),
        "molecule_valid_bool": valid_bool,
        "valid_identity": identities,
        # row-aligned variant (None where the molecule judged invalid):
        # valid_identity compacts to valid molecules only, so any caller
        # pairing identities with per-row data (node counts, targets) must
        # use this key — the hetro train split showed the hazard, where
        # 155/24300 generator rows judge invalid and a zip against
        # valid_identity silently misaligns everything after row 1.
        "identity_by_row": identity,
    }
    if train_identities is not None:
        novel = set(identities) - set(train_identities)
        out["mol_novel"] = len(novel) / max(len(identities), 1)
    return out
