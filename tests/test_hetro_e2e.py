"""Hetro (orientation-mode) end-to-end: train, sample, guide, evaluate."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaudi_tpu.config import EDMConfig, PredictorConfig
from gaudi_tpu.data.synthetic import generate_dataset
from gaudi_tpu.eval_chem import analyze_validity_for_molecules
from gaudi_tpu.sampling import Sampler, to_molecule_list
from gaudi_tpu.train.trainer_edm import EDMTrainer
from gaudi_tpu.train.trainer_predictor import PredictorTrainer


@pytest.fixture(scope="module")
def hetro_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hetro_e2e"))
    csv = generate_dataset(root, "hetro", n_molecules=50, seed=0)
    cfg = EDMConfig(
        dataset="hetro", csv_file=csv, xyz_root=os.path.join(root, "hetro-xyz"),
        max_nodes=10, target_features="GAP_eV",
        n_layers=1, nf=16, diffusion_steps=10, batch_size=8,
        save_dir=os.path.join(root, "summary"), name="h",
    )
    trainer = EDMTrainer(cfg)
    return root, cfg, trainer


class TestHetroE2E:
    def test_train_step_runs(self, hetro_setup):
        _, cfg, trainer = hetro_setup
        m = trainer.train_epoch(0, np.random.default_rng(0), jax.random.PRNGKey(0))
        assert np.isfinite(m["loss"])

    def test_sampling_orientation_layout(self, hetro_setup):
        _, cfg, trainer = hetro_setup
        sampler = Sampler(trainer.edm, cfg.max_nodes, orientation=True)
        counts = np.array([7, 10, 5, 8])
        x, h, nm, em = sampler.sample(
            trainer.state.params, jax.random.PRNGKey(1), counts
        )
        assert x.shape == (4, 20, 3)
        k = trainer.in_node_nf
        # every sampled node gets exactly one ring-type class
        np.testing.assert_allclose(
            np.asarray(h.sum(-1)), np.asarray(nm[..., 0])
        )
        # eval contract round trip
        mols = to_molecule_list(x, h, nm, orientation=True, max_nodes=10)
        assert mols[0][0].shape == (14, 3)  # 7 rings + 7 orientation nodes
        vd, _ = analyze_validity_for_molecules(mols, dataset="hetro")
        assert 0.0 <= vd["mol_stable"] <= 1.0

    def test_guided_sampling_hetro(self, hetro_setup):
        root, cfg, trainer = hetro_setup
        pcfg = PredictorConfig(
            dataset="hetro", csv_file=cfg.csv_file, xyz_root=cfg.xyz_root,
            max_nodes=10, target_features="GAP_eV",
            n_layers=1, nf=16, batch_size=8,
            save_dir=os.path.join(root, "ps"), name="hp",
        )
        ptr = PredictorTrainer(pcfg, edm_cfg=EDMConfig(diffusion_steps=10))

        def target_fn(z, nm, em, t):
            return ptr.model.apply(ptr.state.params, z, nm, em, t)[:, 0]

        sampler = Sampler(trainer.edm, cfg.max_nodes, orientation=True)
        counts = np.array([6, 6])
        x, h, nm, em = sampler.sample_guidance(
            trainer.state.params, jax.random.PRNGKey(2), target_fn, counts,
            scale=0.5,
        )
        assert jnp.isfinite(x).all()
        # CoM-free on the doubled layout
        assert float(jnp.abs((x * nm).sum(1)).max()) < 1e-3
