"""Evaluation-layer tests: stability oracle, GOR->GOA, valence validity.

Encodes the reference's self-validation scripts as real tests (SURVEY.md §4):
ground-truth synthetic molecules must pass the checkers ~100%; corrupted
geometry must fail.
"""

import numpy as np
import pytest

from gaudi_tpu.data import DatasetConfig, create_datasets
from gaudi_tpu.data.synthetic import RING_SPACING, generate_dataset
from gaudi_tpu.eval_chem import (
    analyze_chemical_validity_for_molecules,
    analyze_validity_for_molecules,
    check_stability,
    gor2goa,
    molecule_hash,
    positions2adj,
    valence_valid,
)


def _chain(n, spacing=RING_SPACING):
    """Linear acene ring centers."""
    x = np.zeros((n, 3))
    x[:, 0] = np.arange(n) * spacing
    return x


@pytest.fixture(scope="module")
def cata_molecules(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ev"))
    csv = generate_dataset(root, "cata", n_molecules=40, seed=0)
    cfg = DatasetConfig(
        dataset="cata", csv_file=csv, xyz_root=root + "/cata-xyz",
        max_nodes=11, target_features="GAP_eV",
    )
    tr, _, _ = create_datasets(cfg)
    mols = []
    for b in tr.iter_batches(16, shuffle=False):
        for i in np.nonzero(b["weight"] > 0)[0]:
            nn = b["n_nodes"][i]
            mols.append((b["x"][i][:nn], b["h"][i][:nn].argmax(-1)))
    return mols


class TestPositions2Adj:
    def test_acene_chain_adjacency(self):
        x = _chain(4)
        t = np.zeros((1, 4), np.int64)
        dist, adj = positions2adj(x[None], t, dataset="cata")
        want = np.diag(np.ones(3), 1) + np.diag(np.ones(3), -1)
        np.testing.assert_array_equal(adj[0], want)

    def test_out_of_window_not_adjacent(self):
        x = _chain(2, spacing=3.5)
        _, adj = positions2adj(x[None], np.zeros((1, 2), np.int64), dataset="cata")
        assert adj.sum() == 0

    def test_batched_matches_single(self, cata_molecules):
        # the vectorized batch path must equal per-molecule evaluation
        a = cata_molecules[0]
        b = cata_molecules[1]
        n = min(len(a[0]), len(b[0]))
        xs = np.stack([a[0][:n], b[0][:n]])
        ts = np.stack([a[1][:n], b[1][:n]])
        _, both = positions2adj(xs, ts, dataset="cata")
        _, one = positions2adj(xs[:1], ts[:1], dataset="cata")
        np.testing.assert_array_equal(both[0], one[0])


class TestStability:
    def test_ground_truth_all_stable(self, cata_molecules):
        vd, stable = analyze_validity_for_molecules(cata_molecules, dataset="cata")
        assert vd["mol_stable"] == 1.0
        assert len(stable) == len(cata_molecules)

    def test_garbage_fails(self):
        rng = np.random.default_rng(0)
        mols = [(rng.normal(0, 5, (8, 3)), np.zeros(8, np.int64)) for _ in range(5)]
        vd, _ = analyze_validity_for_molecules(mols, dataset="cata")
        assert vd["mol_stable"] == 0.0

    def test_too_close_fails_dist(self):
        x = _chain(3, spacing=1.0)  # below min distance window
        r = check_stability(x, np.zeros(3, np.int64), dataset="cata")
        assert not r["dist_stable"]

    def test_disconnected_fails(self):
        x = np.zeros((4, 3))
        x[:2, 0] = [0, RING_SPACING]
        x[2:, 0] = [10, 10 + RING_SPACING]
        r = check_stability(x, np.zeros(4, np.int64), dataset="cata")
        assert r["dist_stable"] and not r["connected"]

    def test_orientation_node_check(self):
        # hetro: second half must be exactly the orientation class
        from gaudi_tpu.data.rings import RINGS_LIST

        k = len(RINGS_LIST["hetro"])
        x = np.zeros((4, 3))
        x[:2, 0] = [0, RING_SPACING]
        good_t = np.array([0, 0, k - 1, k - 1])
        bad_t = np.array([0, 0, 0, k - 1])
        assert check_stability(x, good_t, dataset="hetro")["orientation_nodes"]
        assert not check_stability(x, bad_t, dataset="hetro")["orientation_nodes"]


class TestGor2Goa:
    def test_benzene(self):
        pos, types, bonds = gor2goa(np.zeros((1, 3)), np.array([0]), "cata")
        assert pos.shape == (6, 2)
        assert (types == 1).all()  # all carbon
        assert len(bonds) == 6

    def test_naphthalene_fusion(self):
        x = _chain(2)
        pos, types, bonds = gor2goa(x, np.zeros(2, np.int64), "cata")
        # 2 hexagons sharing an edge: 10 atoms, 11 bonds
        assert pos.shape[0] == 10
        assert len(bonds) == 11

    def test_anthracene(self):
        pos, types, bonds = gor2goa(_chain(3), np.zeros(3, np.int64), "cata")
        assert pos.shape[0] == 14
        assert len(bonds) == 16

    def test_fused_atoms_have_merged_positions(self):
        pos, _, bonds = gor2goa(_chain(2), np.zeros(2, np.int64), "cata")
        d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
        np.fill_diagonal(d, 9)
        assert d.min() > 0.5  # no near-duplicate atoms survive


class TestValence:
    def test_benzene_valid(self):
        pos, types, bonds = gor2goa(np.zeros((1, 3)), np.array([0]), "cata")
        assert valence_valid(types, bonds, "cata")

    def test_acenes_valid(self):
        for n in (2, 3, 5):
            pos, types, bonds = gor2goa(_chain(n), np.zeros(n, np.int64), "cata")
            assert valence_valid(types, bonds, "cata"), f"acene {n}"

    def test_odd_ring_invalid(self):
        # a 5-cycle of carbons cannot Kekulize (odd pi count)
        types = np.ones(5, np.int64)
        bonds = [[i, (i + 1) % 5] for i in range(5)]
        assert not valence_valid(types, bonds, "cata")

    def test_disconnected_invalid(self):
        types = np.ones(12, np.int64)
        bonds = [[i, (i + 1) % 6] for i in range(6)] + [
            [6 + i, 6 + (i + 1) % 6] for i in range(6)
        ]
        assert not valence_valid(types, bonds, "cata")

    def test_hash_is_isomorphism_invariant(self):
        types = np.ones(6, np.int64)
        bonds = [[i, (i + 1) % 6] for i in range(6)]
        perm = [2, 0, 5, 1, 4, 3]
        inv = np.argsort(perm)
        bonds2 = [[int(inv[a]), int(inv[b])] for a, b in bonds]
        assert molecule_hash(types, bonds, "cata") == molecule_hash(
            types[perm], bonds2, "cata"
        )

    def test_hash_distinguishes_sizes(self):
        t6 = np.ones(6, np.int64)
        b6 = [[i, (i + 1) % 6] for i in range(6)]
        _, t10, b10 = gor2goa(_chain(2), np.zeros(2, np.int64), "cata")
        assert molecule_hash(t6, b6, "cata") != molecule_hash(t10, b10, "cata")


class TestChemicalMetrics:
    def test_ground_truth_all_valid(self, cata_molecules):
        cd = analyze_chemical_validity_for_molecules(cata_molecules, dataset="cata")
        assert cd["mol_valid"] == 1.0

    def test_novelty_against_self_is_zero(self, cata_molecules):
        cd = analyze_chemical_validity_for_molecules(cata_molecules, dataset="cata")
        cd2 = analyze_chemical_validity_for_molecules(
            cata_molecules, dataset="cata", train_identities=cd["valid_identity"]
        )
        assert cd2["mol_novel"] == 0.0

    def test_novelty_against_empty_is_one(self, cata_molecules):
        cd = analyze_chemical_validity_for_molecules(
            cata_molecules[:5], dataset="cata", train_identities=[]
        )
        assert cd["mol_novel"] == 1.0

    def test_identity_by_row_stays_aligned_with_invalid_rows(
        self, cata_molecules
    ):
        # valid_identity compacts to valid molecules; identity_by_row must
        # keep one entry per input row (None on invalid) so callers can
        # pair identities with per-row data. Regression for the hetro
        # train split, where 155/24300 judge-invalid rows silently
        # misaligned the uniqueness baseline's node-count grouping.
        bad = (np.zeros((2, 3)), np.zeros(2, np.int64))  # degenerate: invalid
        mols = [cata_molecules[0], bad, cata_molecules[1]]
        cd = analyze_chemical_validity_for_molecules(mols, dataset="cata")
        assert len(cd["identity_by_row"]) == 3
        assert cd["identity_by_row"][1] is None
        assert cd["identity_by_row"][0] is not None
        assert cd["identity_by_row"][2] is not None
        assert cd["valid_identity"] == [
            s for s in cd["identity_by_row"] if s is not None
        ]
