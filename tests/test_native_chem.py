"""Native (C++) chem backend vs the pure-python reference implementation.

The native judge (gaudi_tpu/native: union-find + valence accounting +
blossom Kekulé matching + WL identity hashing) must agree exactly with the
python backend (gaudi_tpu/eval_chem/valence.py) on validity, and must
induce the same identity partition (uniqueness groups) as networkx's
Weisfeiler-Lehman hash.
"""

import numpy as np
import pytest

from gaudi_tpu import native
from gaudi_tpu.eval_chem.valence import molecule_hash, valence_valid

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native backend failed to build"
)


def _random_molecule(rng, dataset="hetro"):
    """Random small atom graph: a spanning tree + a few extra edges."""
    n = int(rng.integers(2, 18))
    n_types = 2 if dataset in ("cata", "peri") else 6
    # heavy atoms only (index 0 is H in ATOMS_LIST; gor2goa emits heavy atoms)
    atom_types = rng.integers(1, n_types, size=n)
    edges = set()
    for v in range(1, n):
        u = int(rng.integers(0, v))
        edges.add((u, v))
    for _ in range(int(rng.integers(0, n))):
        a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
        if a != b:
            edges.add((min(a, b), max(a, b)))
    if rng.random() < 0.15 and n > 3:
        # sometimes disconnect: drop every edge touching node 0
        edges = {(a, b) for (a, b) in edges if a != 0 and b != 0}
        if not edges:
            edges = {(1, 2)}
    bonds = np.array(sorted(edges), np.int64)
    return atom_types, bonds


def test_valence_valid_matches_python():
    rng = np.random.default_rng(0)
    n_valid = 0
    for _ in range(400):
        dataset = "hetro" if rng.random() < 0.7 else "cata"
        atom_types, bonds = _random_molecule(rng, dataset)
        py = valence_valid(atom_types, bonds, dataset)
        nat = native.valence_valid(atom_types, bonds, dataset)
        assert py == nat, (atom_types, bonds, dataset)
        n_valid += py
    assert n_valid > 5  # the sweep must exercise the valid branch too


def test_benzenoid_molecules_are_valid():
    # naphthalene carbon skeleton: two fused hexagons (10 C, 11 bonds)
    bonds = np.array(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),
         (4, 6), (6, 7), (7, 8), (8, 9), (9, 5)]
    )
    atoms = np.ones(10, np.int64)  # all carbon (cata vocabulary)
    assert native.valence_valid(atoms, bonds, "cata")
    assert valence_valid(atoms, bonds, "cata")
    # odd carbon count cannot Kekulize
    bonds_bad = np.array([(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)])
    atoms_bad = np.ones(5, np.int64)
    assert not native.valence_valid(atoms_bad, bonds_bad, "cata")
    assert not valence_valid(atoms_bad, bonds_bad, "cata")


def test_identity_partition_matches_networkx():
    """Native WL identity must group molecules exactly like the nx hash."""
    rng = np.random.default_rng(1)
    mols = [_random_molecule(rng, "hetro") for _ in range(120)]
    nat_ids = [native.molecule_identity(a, b, "hetro") for a, b in mols]
    py_ids = [molecule_hash(a, b, "hetro") for a, b in mols]
    for i in range(len(mols)):
        for j in range(i + 1, len(mols)):
            assert (nat_ids[i] == nat_ids[j]) == (py_ids[i] == py_ids[j]), (
                mols[i],
                mols[j],
            )


def test_identity_invariant_to_node_relabeling():
    rng = np.random.default_rng(2)
    for _ in range(30):
        atom_types, bonds = _random_molecule(rng, "hetro")
        n = len(atom_types)
        perm = rng.permutation(n)
        inv = np.argsort(perm)
        a2 = atom_types[inv]
        b2 = np.stack([perm[bonds[:, 0]], perm[bonds[:, 1]]], axis=1)
        assert native.molecule_identity(
            atom_types, bonds, "hetro"
        ) == native.molecule_identity(a2, b2, "hetro")


def test_judge_batch_matches_single_calls():
    rng = np.random.default_rng(3)
    mols = [_random_molecule(rng, "hetro") for _ in range(64)]
    mols.append((np.zeros(0, np.int64), np.zeros((0, 2), np.int64)))  # empty
    valid, ids = native.judge_batch(mols, "hetro")
    for (a, b), ok, ident in zip(mols, valid, ids):
        if len(a) == 0 or len(b) == 0:
            assert not ok and ident is None
            continue
        assert ok == native.valence_valid(a, b, "hetro")
        if ok:
            assert ident == native.molecule_identity(a, b, "hetro")
        else:
            assert ident is None


def _dataset_molecules(dataset, n, seed):
    import tempfile

    from gaudi_tpu.data.synthetic import generate_dataset
    from gaudi_tpu.data.dataset import DatasetConfig, create_datasets

    root = tempfile.mkdtemp(prefix=f"gaudi_natgor_{dataset}_")
    csv = generate_dataset(root, dataset, n_molecules=n, seed=seed)
    max_nodes = 10 if dataset == "hetro" else 11
    cfg = DatasetConfig(
        dataset=dataset, csv_file=csv, xyz_root=f"{root}/{dataset}-xyz",
        max_nodes=max_nodes, target_features="GAP_eV",
    )
    tr, va, te = create_datasets(cfg)
    mols = []
    for ds in (tr, va, te):
        for b in ds.iter_batches(64, shuffle=False):
            for i in np.nonzero(b["weight"] > 0)[0]:
                x, h = b["x"][i], b["h"][i]
                if dataset == "hetro":
                    alive = np.abs(h[:max_nodes]).sum(-1) > 0
                    xi = np.concatenate([x[:max_nodes][alive], x[max_nodes:][alive]])
                    ti = np.concatenate(
                        [h[:max_nodes][alive].argmax(-1),
                         h[max_nodes:][alive].argmax(-1)]
                    )
                else:
                    nn = b["n_nodes"][i]
                    xi, ti = x[:nn], h[:nn].argmax(-1)
                mols.append((xi, ti))
    return mols


@pytest.mark.parametrize("dataset", ["cata", "hetro"])
def test_native_gor2goa_matches_python(dataset):
    """Atom types + bond lists must match the python path exactly;
    positions up to a rigid transform (distance-matrix equality)."""
    from gaudi_tpu.eval_chem.gor2goa import gor2goa_py

    mols = _dataset_molecules(dataset, 40, seed=11)
    assert len(mols) >= 30
    for x, t in mols:
        p_pos, p_types, p_bonds = gor2goa_py(x, t, dataset=dataset)
        n_pos, n_types, n_bonds = native.gor2goa(x, t, dataset=dataset)
        np.testing.assert_array_equal(p_types, n_types)
        assert [list(b) for b in p_bonds] == n_bonds
        dp = np.linalg.norm(p_pos[:, None] - p_pos[None], axis=-1)
        dn = np.linalg.norm(n_pos[:, None] - n_pos[None], axis=-1)
        np.testing.assert_allclose(dp, dn, atol=1e-6)


def test_native_gor2goa_noisy_geometry_matches_python():
    from gaudi_tpu.eval_chem.gor2goa import gor2goa_py

    rng = np.random.default_rng(5)
    mols = _dataset_molecules("cata", 25, seed=13)
    for x, t in mols:
        x = x + rng.normal(0, 0.08, x.shape)  # near the stability tolerance
        p_pos, p_types, p_bonds = gor2goa_py(x, t, dataset="cata")
        n_pos, n_types, n_bonds = native.gor2goa(x, t, dataset="cata")
        np.testing.assert_array_equal(p_types, n_types)
        assert [list(b) for b in p_bonds] == n_bonds


def test_native_gor2goa_rejects_pseudo_class():
    # hetro '.' orientation class has no template: python raises, native too
    from gaudi_tpu.data.rings import RINGS_LIST
    from gaudi_tpu.eval_chem.gor2goa import gor2goa_py

    dot = RINGS_LIST["hetro"].index(".")
    x = np.random.default_rng(0).normal(size=(4, 3))
    t = np.array([dot, 0, dot, 0])
    with pytest.raises(Exception):
        gor2goa_py(x, t, dataset="hetro")
    with pytest.raises(ValueError):
        native.gor2goa(x, t, dataset="hetro")


def test_metrics_native_vs_python_backend(monkeypatch):
    """End-to-end analyze_chemical_validity: both backends, same metrics."""
    from gaudi_tpu.data.synthetic import generate_dataset
    from gaudi_tpu.data.dataset import DatasetConfig, create_datasets
    from gaudi_tpu.eval_chem import analyze_chemical_validity_for_molecules

    import tempfile

    root = tempfile.mkdtemp(prefix="gaudi_natchem_")
    csv = generate_dataset(root, "cata", n_molecules=48, seed=7)
    cfg = DatasetConfig(
        dataset="cata", csv_file=csv, xyz_root=root + "/cata-xyz",
        max_nodes=11, target_features="GAP_eV",
    )
    tr, _, _ = create_datasets(cfg)
    mols = []
    for b in tr.iter_batches(64, shuffle=False):
        for i in np.nonzero(b["weight"] > 0)[0]:
            nn = b["n_nodes"][i]
            mols.append((b["x"][i][:nn], b["h"][i][:nn].argmax(-1)))
    # corrupt a few geometries so the invalid branch is exercised
    for i in range(0, len(mols), 7):
        x, t = mols[i]
        mols[i] = (x * 3.0, t)

    native_out = analyze_chemical_validity_for_molecules(mols, dataset="cata")
    monkeypatch.setattr(native, "available", lambda: False)
    py_out = analyze_chemical_validity_for_molecules(mols, dataset="cata")

    assert native_out["molecule_valid_bool"] == py_out["molecule_valid_bool"]
    assert native_out["mol_valid"] == py_out["mol_valid"]
    assert native_out["mol_unique"] == py_out["mol_unique"]
