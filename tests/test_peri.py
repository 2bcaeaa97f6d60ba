"""Peri-condensed dataset family: generation, pipeline, eval oracle.

The reference's peri support is vestigial (its dataloader flags peri as
orientation mode despite an all-Bn vocabulary, and its stability tables have
no peri entries, so peri eval would KeyError). This framework treats peri as
a first-class cata-style dataset: orientation off, stability restricted to
the checks that have reference-grade windows (distance + connectivity).
"""

import os

import numpy as np
import pytest

from gaudi_tpu.data import DatasetConfig, create_datasets
from gaudi_tpu.data.synthetic import generate_dataset
from gaudi_tpu.eval_chem import analyze_validity_for_molecules


@pytest.fixture(scope="module")
def peri_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("peri"))
    csv = generate_dataset(root, "peri", n_molecules=40, seed=0)
    cfg = DatasetConfig(
        dataset="peri", csv_file=csv, xyz_root=os.path.join(root, "peri-xyz"),
        max_nodes=11, target_features="GAP_eV",
    )
    return cfg, create_datasets(cfg)


class TestPeri:
    def test_no_orientation_mode(self, peri_data):
        cfg, (tr, _, _) = peri_data
        assert not cfg.orientation
        b = next(tr.iter_batches(8))
        assert b["x"].shape == (8, 11, 3)  # not doubled
        assert tr.n_classes == 1  # Bn only

    def test_contains_peri_fusions(self, peri_data):
        # peri patches must include atoms shared by 3 rings somewhere in the
        # set (that's what distinguishes them from catafusenes):
        # equivalently some molecule has more rings than a tree dual allows
        # for its ring adjacency count
        cfg, (tr, _, _) = peri_data
        from gaudi_tpu.eval_chem.stability import positions2adj

        found_cycle = False
        d = tr.data
        for i in range(len(tr)):
            n = d["n_nodes"][i]
            _, adj = positions2adj(
                d["x"][i][None, :n], d["types"][i][None, :n], dataset="peri"
            )
            if adj[0].sum() / 2 > n - 1:  # more ring-ring contacts than a tree
                found_cycle = True
                break
        assert found_cycle

    def test_ground_truth_stable(self, peri_data):
        cfg, (tr, _, _) = peri_data
        mols = []
        for b in tr.iter_batches(16, shuffle=False):
            for i in np.nonzero(b["weight"] > 0)[0]:
                nn = b["n_nodes"][i]
                mols.append((b["x"][i][:nn], b["h"][i][:nn].argmax(-1)))
        vd, _ = analyze_validity_for_molecules(mols, dataset="peri")
        assert vd["mol_stable"] == 1.0

    def test_trains(self, peri_data):
        import jax

        from gaudi_tpu.config import EDMConfig
        from gaudi_tpu.train.trainer_edm import EDMTrainer

        cfg, datasets = peri_data
        ecfg = EDMConfig(
            dataset="peri", csv_file=cfg.csv_file, xyz_root=cfg.xyz_root,
            max_nodes=11, target_features="GAP_eV",
            n_layers=1, nf=16, diffusion_steps=10, batch_size=8,
        )
        tr = EDMTrainer(ecfg, datasets=datasets)
        m = tr.train_epoch(0, np.random.default_rng(0), jax.random.PRNGKey(0))
        assert np.isfinite(m["loss"])
