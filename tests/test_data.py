"""Data-layer tests: ring extraction, synthetic datasets, padded batching.

The reference has no tests; its de-facto oracle is "the checker passes on the
ground-truth dataset" (SURVEY.md §4). We encode that idea directly: extraction
on hand-built molecules, pipeline invariants on synthetic datasets.
"""

import os

import numpy as np
import pytest

from gaudi_tpu.data.dataset import DatasetConfig, create_datasets, get_splits
from gaudi_tpu.data.distributions import NodesDistribution, PropertyDistribution
from gaudi_tpu.data.mol import Molecule, connectivity_matrix, load_xyz, save_xyz
from gaudi_tpu.data.rings import RINGS_LIST, extract_ring_graph
from gaudi_tpu.data.synthetic import (
    BOND_CC,
    RING_SPACING,
    _grow_cata_patch,
    _is_catafusene,
    _patch_to_molecule,
    generate_dataset,
)


def _benzene() -> Molecule:
    ang = np.deg2rad(30 + 60 * np.arange(6))
    coords = np.stack(
        [BOND_CC * np.cos(ang), BOND_CC * np.sin(ang), np.zeros(6)], axis=1
    )
    return Molecule(["C"] * 6, coords)


class TestExtraction:
    def test_benzene_single_ring(self):
        rg = extract_ring_graph(_benzene(), "cata")
        assert rg.n_rings == 1
        np.testing.assert_allclose(rg.centers[0], 0.0, atol=1e-12)
        assert RINGS_LIST["cata"][rg.ring_types[0]] == "Bn"

    def test_naphthalene_two_adjacent_rings(self):
        mol = _patch_to_molecule([(0, 0), (1, 0)])
        rg = extract_ring_graph(mol, "cata")
        assert rg.n_rings == 2
        assert rg.adj[0, 1] == 1
        d = np.linalg.norm(rg.centers[0] - rg.centers[1])
        np.testing.assert_allclose(d, RING_SPACING, atol=1e-6)

    def test_anthracene_chain_adjacency(self):
        mol = _patch_to_molecule([(0, 0), (1, 0), (2, 0)])
        rg = extract_ring_graph(mol, "cata")
        assert rg.n_rings == 3
        assert rg.adj.sum() == 4  # path graph: 2 undirected edges

    def test_connectivity_skip_hydrogen(self):
        mol = _patch_to_molecule([(0, 0)])
        assert "H" in mol.elements
        adj = connectivity_matrix(mol, skip_hydrogen=True)
        h_rows = [i for i, e in enumerate(mol.elements) if e == "H"]
        assert adj[h_rows].sum() == 0

    def test_xyz_roundtrip(self, tmp_path):
        mol = _patch_to_molecule([(0, 0), (1, 0)])
        p = str(tmp_path / "m.xyz")
        save_xyz(p, mol, "test")
        back = load_xyz(p)
        assert back.elements == mol.elements
        np.testing.assert_allclose(back.coords, mol.coords, atol=1e-5)

    def test_hetero_orientation_atoms(self):
        # single pyridine-like ring: N at slot 0 -> orientation = N coords
        mol = _patch_to_molecule([(0, 0)], {0: ("Pd", "N", (0,))})
        rg = extract_ring_graph(mol, "hetro")
        assert rg.n_rings == 1
        assert RINGS_LIST["hetro"][rg.ring_types[0]] == "Pd"
        assert rg.orientations[0].shape == (1, 3)
        # orientation atom is the nitrogen, not the centroid
        assert np.linalg.norm(rg.orientations[0][0] - rg.centers[0]) > 1.0


class TestSynthetic:
    def test_patch_growth_is_cata(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            cells = _grow_cata_patch(rng, 8)
            assert len(cells) == 8

    def test_catafusene_invariant_rejects_coronene(self):
        # 6 cells around an empty center enclose a void -> not catafusene
        ring6 = [(1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1)]
        assert not _is_catafusene(ring6, 6)

    def test_catafusene_invariant_accepts_acene(self):
        assert _is_catafusene([(0, 0), (1, 0), (2, 0)], 3)

    def test_generated_ring_counts_match_csv(self, tmp_path):
        import pandas as pd

        csv = generate_dataset(str(tmp_path), "cata", n_molecules=20, seed=3)
        df = pd.read_csv(csv)
        for _, row in df.iterrows():
            mol = load_xyz(
                os.path.join(str(tmp_path), "cata-xyz", row["molecule"] + ".xyz")
            )
            rg = extract_ring_graph(mol, "cata")
            assert rg.n_rings == row["n_rings"]

    def test_labeled_mode_keeps_invalid_with_column(self, tmp_path):
        """labeled=True emits a VALID column with both classes present and
        labels that match the chemical oracle on the written geometry."""
        import pandas as pd

        from gaudi_tpu.data.synthetic import _skeleton_chemically_valid

        csv = generate_dataset(
            str(tmp_path), "peri", n_molecules=24, max_rings=7, seed=1,
            labeled=True, roundtrip_trials=1,
        )
        df = pd.read_csv(csv)
        assert "VALID" in df.columns
        vals = set(df["VALID"].astype(int))
        assert vals == {0, 1}  # both classes must appear
        for _, row in df.sample(6, random_state=0).iterrows():
            mol = load_xyz(
                os.path.join(str(tmp_path), "peri-xyz", row["molecule"] + ".xyz")
            )
            assert _skeleton_chemically_valid(mol, "peri") == bool(row["VALID"])

    def test_unlabeled_mode_has_no_valid_column(self, tmp_path):
        import pandas as pd

        csv = generate_dataset(str(tmp_path), "cata", n_molecules=6, seed=5)
        assert "VALID" not in pd.read_csv(csv).columns

    def test_huckel_targets_have_acene_trend(self, tmp_path):
        # longer linear acenes must have smaller Hueckel gaps
        from gaudi_tpu.data.synthetic import _huckel_targets

        rng = np.random.default_rng(0)
        gaps = []
        for n in (2, 4, 6):
            mol = _patch_to_molecule([(i, 0) for i in range(n)])
            gaps.append(_huckel_targets(mol, rng)["GAP_eV"])
        assert gaps[0] > gaps[1] > gaps[2]


@pytest.fixture(scope="module")
def cata_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cata_ds"))
    csv = generate_dataset(root, "cata", n_molecules=50, seed=0)
    cfg = DatasetConfig(
        dataset="cata",
        csv_file=csv,
        xyz_root=os.path.join(root, "cata-xyz"),
        max_nodes=11,
        target_features="GAP_eV,HOMO_eV",
    )
    return cfg, create_datasets(cfg)


class TestDataset:
    def test_split_sizes_disjoint(self, cata_data):
        cfg, (tr, va, te) = cata_data
        d1, d2, d3, dall = get_splits(cfg)
        assert len(d1) + len(d2) + len(d3) == len(dall)
        assert set(d1.molecule) & set(d2.molecule) == set()
        assert set(d1.molecule) & set(d3.molecule) == set()

    def test_batch_shapes_and_masks(self, cata_data):
        cfg, (tr, _, _) = cata_data
        b = next(tr.iter_batches(8, rng=np.random.default_rng(0)))
        assert b["x"].shape == (8, 11, 3)
        assert b["h"].shape == (8, 11, 1)
        assert b["node_mask"].shape == (8, 11, 1)
        nm = b["node_mask"][..., 0]
        # padded slots must be exactly zero in x and h
        assert np.abs(b["x"] * (1 - nm[..., None])).max() == 0
        assert np.abs(b["h"] * (1 - nm[..., None])).max() == 0
        # h sums to one on real nodes
        np.testing.assert_allclose(b["h"].sum(-1), nm)

    def test_target_normalization_stats(self, cata_data):
        cfg, (tr, _, _) = cata_data
        ys = np.concatenate(
            [
                b["y"][b["weight"] > 0]
                for b in tr.iter_batches(16, shuffle=False)
            ]
        )
        # train targets are ~zero-mean/unit-std under train stats (the stats
        # come from the unfiltered train df, so only approximately)
        assert np.abs(ys.mean(0)).max() < 0.3
        assert np.abs(ys.std(0) - 1.0).max() < 0.3

    def test_partial_batch_padding_weights(self, cata_data):
        cfg, (tr, _, _) = cata_data
        batches = list(tr.iter_batches(16, shuffle=False))
        total = sum(int((b["weight"] > 0).sum()) for b in batches)
        assert total == len(tr)
        for b in batches:
            assert b["x"].shape[0] == 16

    def test_plane_rms_and_sampling_probs(self, cata_data):
        cfg, (tr, _, _) = cata_data
        rms = tr.plane_rms()
        assert rms.shape == (tr.data["x"].shape[0],)
        assert (rms >= 0).all() and np.isfinite(rms).all()
        # boost=0 -> uniform shuffled epochs (None sentinel)
        assert tr.sampling_probs(0.0, 0.1) is None
        p = tr.sampling_probs(0.8, 0.05)
        assert p.shape == (len(tr),)
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
        # more planar molecules must never get a lower probability
        r = rms[tr.examples]
        order = np.argsort(r)
        assert p[order[0]] >= p[order[-1]]
        # mixture keeps a uniform floor: nothing below (1-boost)/n
        assert p.min() >= (1 - 0.8) / len(p) * (1 - 1e-9)

    def test_iter_batches_weighted_draw(self, cata_data):
        """probs drives the epoch draw (with replacement) while keeping
        epoch length and static batch shapes unchanged."""
        cfg, (tr, _, _) = cata_data
        p = tr.sampling_probs(0.9, 0.02)
        batches = list(tr.iter_batches(16, rng=np.random.default_rng(0), probs=p))
        total = sum(int((b["weight"] > 0).sum()) for b in batches)
        assert total == len(tr)
        for b in batches:
            assert b["x"].shape == (16, 11, 3)
        # a delta distribution must reproduce exactly one example everywhere
        delta = np.zeros(len(tr))
        delta[3] = 1.0
        b = next(tr.iter_batches(8, rng=np.random.default_rng(1), probs=delta))
        want = tr.collate(np.repeat(tr.examples[3], 8), np.random.default_rng(2))
        np.testing.assert_array_equal(b["n_nodes"], want["n_nodes"])
        np.testing.assert_array_equal(b["h"], want["h"])

    def test_cache_reuse(self, cata_data):
        cfg, (tr, _, _) = cata_data
        # second construction must hit the npz cache and produce same data
        tr2, _, _ = create_datasets(cfg)
        np.testing.assert_array_equal(tr.data["x"], tr2.data["x"])

    def test_cache_shared_across_target_sets(self, cata_data):
        """The geometry cache is target-independent: a different
        target_features set must reuse the same npz (targets are sliced
        from the CSV at load time) and yield identical geometry."""
        import dataclasses
        import glob
        import os

        cfg, (tr, _, _) = cata_data
        cache_dir = cfg.xyz_root.rstrip("/") + "_tpu_cache"
        before = set(glob.glob(os.path.join(cache_dir, "*.npz")))
        cfg2 = dataclasses.replace(cfg, target_features="GAP_eV,HOMO_eV")
        tr2, _, _ = create_datasets(cfg2)
        after = set(glob.glob(os.path.join(cache_dir, "*.npz")))
        assert before == after, "different targets must not re-preprocess"
        np.testing.assert_array_equal(tr.data["x"], tr2.data["x"])
        assert tr2.data["y"].shape[1] == 2


class TestHetroDataset:
    def test_orientation_batch_layout(self, tmp_path):
        root = str(tmp_path)
        csv = generate_dataset(root, "hetro", n_molecules=25, seed=2)
        cfg = DatasetConfig(
            dataset="hetro",
            csv_file=csv,
            xyz_root=os.path.join(root, "hetro-xyz"),
            max_nodes=10,
            target_features="GAP_eV",
        )
        tr, _, _ = create_datasets(cfg)
        b = next(tr.iter_batches(4, rng=np.random.default_rng(0)))
        assert b["x"].shape == (4, 20, 3)
        k = tr.n_classes
        nm = b["node_mask"][..., 0]
        n = b["n_nodes"]
        for i in range(4):
            # slots [10, 10+n) are orientation nodes with the last class
            assert (b["h"][i, 10 : 10 + n[i], -1] == 1).all()
            # ring slots never use the orientation class
            assert (b["h"][i, : n[i], -1] == 0).all()
            # alive pattern duplicated
            np.testing.assert_array_equal(nm[i, :10], nm[i, 10:])

    def test_orientation_resampling_varies(self, tmp_path):
        # rings with >= 2 hetero candidates should see different picks
        root = str(tmp_path)
        csv = generate_dataset(root, "hetro", n_molecules=30, seed=4, hetero_prob=0.9)
        cfg = DatasetConfig(
            dataset="hetro",
            csv_file=csv,
            xyz_root=os.path.join(root, "hetro-xyz"),
            max_nodes=10,
            target_features="GAP_eV",
        )
        tr, _, _ = create_datasets(cfg)
        if (tr.data["orient_count"] >= 2).sum() == 0:
            pytest.skip("no multi-candidate rings generated")
        idx = np.arange(min(len(tr), 16))
        b1 = tr.collate(idx, np.random.default_rng(1))
        b2 = tr.collate(idx, np.random.default_rng(2))
        assert not np.allclose(b1["x"], b2["x"])


class TestDistributions:
    def test_nodes_distribution_sampling(self, cata_data):
        _, (tr, _, _) = cata_data
        nd = NodesDistribution.from_dataset(tr)
        s = nd.sample(500, np.random.default_rng(0))
        assert s.min() >= 1 and s.max() <= 11
        lp = nd.log_prob(s[:10])
        assert np.isfinite(lp).all()

    def test_reference_histogram_totals(self):
        nd = NodesDistribution(dataset="cata")
        # cata usable set is 27,593 molecules (BASELINE.md)
        assert int((nd.prob * 27593).round().sum()) == 27593

    def test_property_distribution_range(self, cata_data):
        _, (tr, _, _) = cata_data
        pdist = PropertyDistribution(tr)
        rng = np.random.default_rng(0)
        vals = pdist.sample_batch(np.array([8, 9, 10]), rng)
        assert vals.shape == (3, 2)
        un = pdist.unnormalize(vals)
        # unnormalized values are in a plausible target range
        assert np.isfinite(un).all()


class TestIdentityDedup:
    """Generation-time dedup by the eval's chemical identity (VERDICT r3 #7)."""

    def test_distinct_identities(self, tmp_path):
        import pandas as pd

        from gaudi_tpu.data.mol import load_xyz
        from gaudi_tpu.data.synthetic import _skeleton_graph, generate_dataset
        from gaudi_tpu.eval_chem.valence import molecule_hash

        root = str(tmp_path)
        csv = generate_dataset(root, "cata", n_molecules=40, seed=3)
        df = pd.read_csv(csv)
        ids = set()
        for name in df["molecule"]:
            m = load_xyz(f"{root}/cata-xyz/{name}.xyz")
            t, p = _skeleton_graph(m, "cata")
            ids.add(molecule_hash(t, p, "cata"))
        assert len(ids) == len(df), "duplicate chemical identities shipped"

    def test_saturated_space_terminates(self, tmp_path):
        import pandas as pd

        from gaudi_tpu.data.synthetic import generate_dataset

        # the whole 2..3-ring catafusene space is 3 molecules; asking for 10
        # must exercise the saturation guard and ship exactly the space
        csv = generate_dataset(str(tmp_path), "cata", n_molecules=10,
                               min_rings=2, max_rings=3, seed=0)
        df = pd.read_csv(csv)
        assert len(df) == 3
        assert sorted(df.n_rings) == [2, 3, 3]

    def test_canonical_cells_isometry_invariant(self):
        import numpy as np

        from gaudi_tpu.data.synthetic import _canonical_cells, _grow_patch

        rng = np.random.default_rng(0)
        for _ in range(40):
            cells = _grow_patch(rng, int(rng.integers(2, 11)))
            base = _canonical_cells(cells)
            assert _canonical_cells([(q + 3, r - 2) for q, r in cells]) == base
            assert _canonical_cells([(-r, q + r) for q, r in cells]) == base
            assert _canonical_cells([(q, -q - r) for q, r in cells]) == base
