"""Model-parallel (2-D mesh) sharding tests.

The models carry logical activation axes (models/egnn.py EDGE_LOGICAL_AXES /
NODE_LOGICAL_AXES) that PARALLELISM_RULES maps onto the "model" axis of a
2-D ("data", "model") mesh — "tp" shards hidden channels, "sp" shards the
receiver-node axis of the [B, N, N, H] edge tensors. Pure
with_sharding_constraint annotations must be mathematically transparent:
every configuration here is checked against the unsharded program on the
same data and keys. (The production configuration remains pure DP — these
model sizes don't need a model axis; the tests prove the framework supports
one. SURVEY.md §2.5, PARITY.md §2.5.)
"""

import jax
import numpy as np
import pytest

from gaudi_tpu.config import EDMConfig, PredictorConfig
from gaudi_tpu.data.synthetic import generate_dataset
from gaudi_tpu.parallel.mesh import PARALLELISM_RULES, create_mesh, create_mesh_2d

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_exp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tp"))
    csv = generate_dataset(root, "cata", n_molecules=60, seed=0)
    cfg = EDMConfig(
        dataset="cata", csv_file=csv, xyz_root=root + "/cata-xyz",
        max_nodes=11, target_features="GAP_eV",
        n_layers=1, nf=16, diffusion_steps=20, batch_size=16,
        num_epochs=1, save_dir=root + "/summary", name="tiny-tp", lr=1e-3,
    )
    return root, cfg


def _one_batch(trainer, seed=3):
    batch = next(
        trainer.train_ds.iter_batches(16, rng=np.random.default_rng(seed))
    )
    return tuple(
        jnp.asarray(batch[k]) for k in ("x", "h", "n_nodes", "weight")
    )


def test_mesh_2d_shape_and_rules():
    mesh = create_mesh_2d(2, 4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)
    # mp defaults to all remaining devices
    mesh2 = create_mesh_2d(4)
    assert mesh2.devices.shape == (4, 2)
    assert set(PARALLELISM_RULES) == {"dp", "tp", "sp"}


@pytest.mark.parametrize("mode", ["tp", "sp"])
def test_mp_sharded_edm_step_matches_single(tiny_exp, mode):
    """EDM train step under tensor/sequence parallelism == unsharded.

    tp: hidden 16 over mp=4 (divisible); sp: receiver axis 11 over mp=4
    (non-divisible — XLA pads), both on a 2x4 (data, model) mesh.
    """
    from gaudi_tpu.train.trainer_edm import EDMTrainer

    _, cfg = tiny_exp
    tr1 = EDMTrainer(cfg)
    tr2 = EDMTrainer(cfg, mesh=create_mesh_2d(2, 4), mp_mode=mode)
    args = _one_batch(tr1)
    key = jax.random.PRNGKey(5)
    s1, m1 = tr1._train_step(tr1.state, *args, key)
    s2, m2 = tr2._train_step(tr2.state, *args, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    p1, p2 = jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_sharded_predictor_step_matches_single(tiny_exp):
    from gaudi_tpu.train.trainer_predictor import PredictorTrainer

    root, ecfg = tiny_exp
    cfg = PredictorConfig(
        dataset="cata", csv_file=ecfg.csv_file, xyz_root=ecfg.xyz_root,
        max_nodes=11, target_features="GAP_eV",
        n_layers=1, nf=16, batch_size=16, num_epochs=1,
        save_dir=root + "/psummary", name="tinyp-tp",
    )
    edm_cfg = EDMConfig(diffusion_steps=20)
    tr1 = PredictorTrainer(cfg, edm_cfg=edm_cfg)
    tr2 = PredictorTrainer(
        cfg, edm_cfg=edm_cfg,
        datasets=(tr1.train_ds, tr1.val_ds, tr1.test_ds),
        mesh=create_mesh_2d(2, 4), mp_mode="tp",
    )
    batch = next(
        tr1.train_ds.iter_batches(16, rng=np.random.default_rng(1))
    )
    args = tr1._batch_arrays(batch)
    key = jax.random.PRNGKey(2)
    s1, m1 = tr1._train_step(tr1.state, *args, key)
    s2, m2 = tr2._train_step(tr2.state, *args, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_tp_sharded_guided_sampling_matches_single(tiny_exp):
    """The flagship guided reverse scan (EDM + grad-through-predictor in the
    scan body) under tp == the unsharded scan, bitwise-keyed."""
    from gaudi_tpu.models.predictor import EGNNPredictor
    from gaudi_tpu.sampling import Sampler
    from gaudi_tpu.train.trainer_edm import EDMTrainer

    _, cfg = tiny_exp
    tr = EDMTrainer(cfg)
    predictor = EGNNPredictor(
        in_nf=tr.in_node_nf, out_nf=1, hidden_nf=16, n_layers=1
    )
    key = jax.random.PRNGKey(0)
    n = cfg.max_nodes
    pparams = predictor.init(
        key,
        jnp.zeros((2, n, 3 + tr.in_node_nf)),
        jnp.ones((2, n, 1)),
        jnp.ones((2, n, n)),
        jnp.zeros((2, 1)),
    )

    def target_fn(zt, nm, em, t):
        return predictor.apply(pparams, zt, nm, em, t)[:, 0]

    counts = np.full(16, 5, np.int64)
    k = jax.random.PRNGKey(7)
    s1 = Sampler(tr.edm, cfg.max_nodes)
    x1, h1, _, _ = s1.sample_guidance(
        tr.state.params, k, target_fn, counts, scale=0.3
    )
    s2 = Sampler(
        tr.edm, cfg.max_nodes, mesh=create_mesh_2d(2, 4), mp_mode="tp"
    )
    x2, h2, _, _ = s2.sample_guidance(
        tr.state.params, k, target_fn, counts, scale=0.3
    )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_dp_mode_unaffected_by_logical_axes(tiny_exp):
    """The 1-D DP path (no rules context) must be bit-identical to before the
    logical constraints were added — they resolve to identity without rules."""
    from gaudi_tpu.sampling import Sampler
    from gaudi_tpu.train.trainer_edm import EDMTrainer

    _, cfg = tiny_exp
    tr = EDMTrainer(cfg)
    counts = np.full(16, 5, np.int64)
    key = jax.random.PRNGKey(9)
    s1 = Sampler(tr.edm, cfg.max_nodes)
    x1, h1, _, _ = s1.sample(tr.state.params, key, counts, std=0.7)
    s2 = Sampler(tr.edm, cfg.max_nodes, mesh=create_mesh(8))
    x2, h2, _, _ = s2.sample(tr.state.params, key, counts, std=0.7)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
