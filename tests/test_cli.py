"""CLI entry-point tests: the full user workflow end-to-end on tiny configs.

Covers the reference's five entry scripts (train_edm, train_cond_predictor,
eval_validity, eval_cond_predictor, generation_guidance) through this
framework's `python -m gaudi_tpu.cli.*` mains.
"""

import json
import os

import numpy as np
import pytest

from gaudi_tpu.cli import (
    eval_predictor,
    eval_validity,
    generate,
    train_edm,
    train_predictor,
)
from gaudi_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    generate_dataset(root, "cata", n_molecules=50, seed=0)
    return root


@pytest.fixture(scope="module")
def trained(workspace):
    root = workspace
    common = [
        "--dataset", "cata", "--data-root", root, "--max-nodes", "11",
        "--target-features", "GAP_eV,HOMO_eV",
    ]
    train_edm.main(
        common
        + ["--name", "edm", "--save-dir", f"{root}/summary", "--epochs", "2",
           "--batch-size", "16", "--n-layers", "1", "--nf", "16",
           "--diffusion-steps", "10"]
    )
    train_predictor.main(
        common
        + ["--name", "pred", "--save-dir", f"{root}/psummary", "--epochs", "1",
           "--batch-size", "16", "--n-layers", "1", "--nf", "16",
           "--diffusion-steps", "10"]
    )
    return root


class TestCLI:
    def test_training_artifacts(self, trained):
        exp = f"{trained}/summary/edm"
        assert os.path.exists(f"{exp}/args.json")
        assert os.path.exists(f"{exp}/metrics.jsonl")
        assert os.path.isdir(f"{exp}/model")
        with open(f"{exp}/args.json") as f:
            assert json.load(f)["nf"] == 16

    def test_eval_validity(self, trained):
        out = eval_validity.main(
            ["--exp-dir", f"{trained}/summary/edm", "--n-samples", "8",
             "--batch-size", "8", "--plots", "1"]
        )
        assert 0.0 <= out["stability"]["mol_stable"] <= 1.0
        assert 0.0 <= out["chemistry"]["mol_valid"] <= 1.0
        assert out["sampling_seconds"] > 0

    def test_eval_validity_polish_flags(self, trained):
        # exact flag set the campaign scripts pass (scripts/phase_r2b.sh);
        # a missing knob here silently kills the scheduled final evals
        out = eval_validity.main(
            ["--exp-dir", f"{trained}/summary/edm", "--n-samples", "8",
             "--batch-size", "8", "--plots", "0", "--polish", "2",
             "--polish-t", "0.05", "--polish-noise", "0.5",
             "--polish-decay", "0.7"]
        )
        assert 0.0 <= out["stability"]["mol_stable"] <= 1.0

    def test_eval_validity_rejection(self, trained):
        # production rejection-resampling: final set is the requested size,
        # post-rejection failure count never exceeds the first pass's, and
        # the raw first-pass metrics are preserved alongside
        out = eval_validity.main(
            ["--exp-dir", f"{trained}/summary/edm", "--n-samples", "8",
             "--batch-size", "8", "--plots", "0", "--reject", "2",
             "--reject-criterion", "valid"]
        )
        assert out["rejection"]["device_sampled"] >= 8
        assert out["rejection"]["oversampling_factor"] >= 1.0
        assert 0.0 <= out["first_pass"]["chemistry"]["mol_valid"] <= 1.0
        n_final = len(out["chemistry"]["molecule_valid_bool"])
        assert n_final == 8
        first_bad = sum(
            not v for v in out["first_pass"]["chemistry"]["molecule_valid_bool"]
        )
        final_bad = sum(not v for v in out["chemistry"]["molecule_valid_bool"])
        assert final_bad <= first_bad

    def test_eval_predictor(self, trained):
        out = eval_predictor.main(
            ["--exp-dir", f"{trained}/psummary/pred", "--n-levels", "3"]
        )
        assert len(out["mae"]) == 3
        assert all(np.isfinite(out["mae"]))

    def test_generate(self, trained):
        out = generate.main(
            ["--edm-dir", f"{trained}/summary/edm",
             "--predictor-dir", f"{trained}/psummary/pred",
             "--batch-size", "8", "--scale", "0.5", "--n-nodes", "6",
             "--target", "min:GAP_eV", "--out-dir", f"{trained}/best"]
        )
        assert out["gen_seconds"] > 0
        assert np.isfinite(out["mean_target"])
        assert os.path.isdir(out["run_dir"])

    def test_generate_eq_target(self, trained):
        out = generate.main(
            ["--edm-dir", f"{trained}/summary/edm",
             "--predictor-dir", f"{trained}/psummary/pred",
             "--batch-size", "8", "--scale", "0.3", "--n-nodes", "5",
             "--target", "eq:GAP_eV=2.0", "--out-dir", f"{trained}/best"]
        )
        # energy (pred - 2.0)^2 is non-negative and finite
        assert np.isfinite(out["mean_target"]) and out["mean_target"] >= 0

    def test_generate_weighted_target(self, trained):
        out = generate.main(
            ["--edm-dir", f"{trained}/summary/edm",
             "--predictor-dir", f"{trained}/psummary/pred",
             "--batch-size", "8", "--scale", "0.3", "--n-nodes", "5",
             "--target", "1*GAP_eV+-0.5*HOMO_eV", "--out-dir", f"{trained}/best"]
        )
        assert np.isfinite(out["mean_target"])

    def test_generate_normalized_annealed_combo(self, trained):
        """Per-property gradient normalization + cos2 annealing through the
        full CLI path (the round-5 production recipe for multi-objective
        targets at the reference's scale 0.6); also checks the cold/warm
        timing split lands in the result."""
        out = generate.main(
            ["--edm-dir", f"{trained}/summary/edm",
             "--predictor-dir", f"{trained}/psummary/pred",
             "--batch-size", "8", "--scale", "0.6", "--n-nodes", "5",
             "--target", "1*GAP_eV+-0.5*HOMO_eV",
             "--grad-norm-per-property", "--anneal", "cos2:0.05",
             "--out-dir", f"{trained}/best"]
        )
        assert np.isfinite(out["mean_target"])
        assert out["warm_mol_per_s"] and out["warm_mol_per_s"] > 0
        assert out["compile_s"] is not None

    def test_generate_per_property_rejects_single_target(self, trained):
        with pytest.raises(SystemExit):
            generate.main(
                ["--edm-dir", f"{trained}/summary/edm",
                 "--predictor-dir", f"{trained}/psummary/pred",
                 "--batch-size", "4", "--n-nodes", "5",
                 "--target", "min:GAP_eV", "--grad-norm-per-property",
                 "--out-dir", f"{trained}/best"]
            )

    def test_export_artifact_is_self_contained(self, trained, tmp_path):
        """export_params → artifact dir that samples correctly even when
        csv_file points at a path that no longer exists (the post-VM-recycle
        state), using the RECORDED train-split stats (ADVICE r2 medium)."""
        import jax

        from gaudi_tpu.cli import export_params
        from gaudi_tpu.config import EDMConfig
        from gaudi_tpu.data import StatsOnlyDataset
        from gaudi_tpu.sampling import Sampler
        from gaudi_tpu.train.trainer_edm import EDMTrainer

        art = str(tmp_path / "cata-edm")
        export_params.main(
            ["--exp-dir", f"{trained}/summary/edm", "--out", art]
        )
        assert os.path.exists(f"{art}/weights.npz")

        # reference stats from the live experiment
        cfg0 = EDMConfig.load(f"{trained}/summary/edm")
        tr0 = EDMTrainer(cfg0)

        # simulate the recycle: csv/xyz paths in args.json no longer exist
        with open(f"{art}/args.json") as f:
            d = json.load(f)
        d["csv_file"] = str(tmp_path / "gone" / "cata.csv")
        d["xyz_root"] = str(tmp_path / "gone" / "cata-xyz")
        with open(f"{art}/args.json", "w") as f:
            json.dump(d, f)

        cfg = EDMConfig.load(art)
        tr = EDMTrainer(cfg)
        assert isinstance(tr.train_ds, StatsOnlyDataset)
        np.testing.assert_allclose(tr.train_ds.mean, tr0.train_ds.mean)
        np.testing.assert_allclose(tr.train_ds.std, tr0.train_ds.std)
        np.testing.assert_allclose(tr.nodes_dist.prob, tr0.nodes_dist.prob)
        # weights restored from the artifact, not re-initialized
        for a, b in zip(
            jax.tree.leaves(tr.state.params), jax.tree.leaves(tr0.state.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the full sampling path works without any data files
        sampler = Sampler(tr.edm, cfg.max_nodes, False, dataset=cfg.dataset)
        rng = np.random.default_rng(0)
        counts = tr.nodes_dist.sample(4, rng)
        x, h, nm, _ = sampler.sample(
            tr.sampling_params, jax.random.PRNGKey(0), counts, std=0.7
        )
        assert np.isfinite(np.asarray(x)).all()
        # training paths refuse clearly instead of failing deep in pandas
        with pytest.raises(RuntimeError, match="stats-only artifact"):
            tr.train_epoch(0, rng, jax.random.PRNGKey(1))

    def test_artifact_stats_override_regenerated_csv(self, trained, tmp_path):
        """When the artifact's csv path EXISTS but holds different data
        (regenerated with another seed), the recorded stats win + a drift
        warning fires — conditioned eval can't silently shift."""
        import warnings

        from gaudi_tpu.cli import export_params
        from gaudi_tpu.config import EDMConfig
        from gaudi_tpu.train.trainer_edm import EDMTrainer

        art = str(tmp_path / "cata-edm2")
        export_params.main(
            ["--exp-dir", f"{trained}/summary/edm", "--out", art]
        )
        cfg0 = EDMConfig.load(f"{trained}/summary/edm")
        tr0 = EDMTrainer(cfg0)

        root2 = str(tmp_path / "regen")
        generate_dataset(root2, "cata", n_molecules=30, seed=99)
        with open(f"{art}/args.json") as f:
            d = json.load(f)
        d["csv_file"] = f"{root2}/cata.csv"
        d["xyz_root"] = f"{root2}/cata-xyz"
        with open(f"{art}/args.json", "w") as f:
            json.dump(d, f)

        cfg = EDMConfig.load(art)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # drift magnitude is data-luck
            tr = EDMTrainer(cfg)
        # real data present: training still possible...
        assert len(tr.train_ds) > 0
        # ...but normalization is the recorded one, not the regenerated one
        np.testing.assert_allclose(tr.train_ds.mean, tr0.train_ds.mean)
        np.testing.assert_allclose(tr.train_ds.std, tr0.train_ds.std)
        np.testing.assert_allclose(tr.nodes_dist.prob, tr0.nodes_dist.prob)

    def test_check_dataset_oracle(self, workspace):
        from gaudi_tpu.cli import check_dataset

        out = check_dataset.main(
            ["--dataset", "cata", "--data-root", workspace,
             "--max-molecules", "40", "--target-features", "GAP_eV"]
        )
        # ground-truth molecules must pass their own checkers (~100%)
        assert out["mol_stable"] == 1.0
        assert out["mol_valid"] == 1.0

    def test_synthetic_flag_generates_missing_data(self, tmp_path):
        root = str(tmp_path)
        res = train_edm.main(
            ["--dataset", "cata", "--data-root", root, "--synthetic", "30",
             "--name", "auto", "--save-dir", f"{root}/s", "--epochs", "1",
             "--batch-size", "8", "--n-layers", "1", "--nf", "8",
             "--diffusion-steps", "5", "--target-features", "GAP_eV",
             "--max-nodes", "11"]
        )
        assert np.isfinite(res["test_loss"])
        assert os.path.exists(f"{root}/cata.csv")


class TestHoldoutNovelty:
    def test_holdout_identity_set_and_split_reporting(self, workspace):
        """holdout_identity_set judges every csv row with the same identity
        key the sample judge uses, caches to disk, and the novelty-split
        arithmetic follows (round-5 identity-holdout evaluation)."""
        from gaudi_tpu.cli.common import holdout_identity_set

        csv = os.path.join(workspace, "cata.csv")
        ids = holdout_identity_set(csv, "cata", n_workers=0)
        assert len(ids) > 10           # most synthetic rows judge valid
        assert "" not in ids
        # cached second call is identical
        assert holdout_identity_set(csv, "cata") == ids
        assert os.path.exists(csv + ".ids.npz")
