"""Time-conditioned property-predictor trainer.

Rebuild of reference cond_prediction/train_cond_predictor.py:47-277: each
batch is noised to a uniformly random diffusion time with the *frozen EDM's*
schedule, then the predictor regresses normalized targets under L1 loss. The
final test sweep evaluates MAE at 11 fixed noise levels (t in linspace(0, T)),
validating the time conditioning.

Same jitted-step design as EDMTrainer (masks from node counts on device, no
host syncs; batch-sharded under a mesh).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaudi_tpu.config import EDMConfig, PredictorConfig
from gaudi_tpu.core import masked as M
from gaudi_tpu.diffusion.edm import EDM
from gaudi_tpu.diffusion.schedule import NoiseSchedule
from gaudi_tpu.models.predictor import EGNNPredictor
from gaudi_tpu.parallel.mesh import (
    batch_sharding,
    call_with_rules,
    replicated_sharding,
)
from gaudi_tpu.data import resolve_datasets
from gaudi_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from gaudi_tpu.train.logging import MetricsLogger
from gaudi_tpu.train.optim import make_optimizer
from gaudi_tpu.train.state import TrainState


def build_predictor(cfg: PredictorConfig, in_nf: int, out_nf: int) -> EGNNPredictor:
    return EGNNPredictor(
        in_nf=in_nf,
        dtype=jnp.dtype(cfg.dtype),
        out_nf=out_nf,
        hidden_nf=cfg.nf,
        n_layers=cfg.n_layers,
        attention=cfg.attention,
        tanh=cfg.tanh,
        coords_range=cfg.coords_range,
        condition_time=True,
    )


class PredictorTrainer:
    """Trains EGNNPredictor on EDM-noised inputs.

    `edm` supplies normalize() and the noise schedule only — its parameters
    are unused (reference builds the full EDM for the same purpose,
    train_cond_predictor.py:216).
    """

    def __init__(
        self,
        cfg: PredictorConfig,
        edm_cfg: Optional[EDMConfig] = None,
        datasets=None,
        mesh=None,
        mp_mode=None,
    ):
        """mp_mode: optional PARALLELISM_RULES key ("tp"/"sp") — see
        EDMTrainer; None = pure DP."""
        self.cfg = cfg
        self.mesh = mesh
        self.mp_mode = mp_mode
        if datasets is None:
            # artifact-aware (see EDMTrainer): recorded stats override, and
            # stand in for, the data files
            datasets = resolve_datasets(cfg.data_config(), cfg.restore)
        self.train_ds, self.val_ds, self.test_ds = datasets

        edm_cfg = edm_cfg or EDMConfig(dataset=cfg.dataset, max_nodes=cfg.max_nodes)
        schedule = NoiseSchedule.create(
            edm_cfg.diffusion_noise_schedule,
            edm_cfg.diffusion_steps,
            edm_cfg.diffusion_noise_precision,
        )
        self.in_node_nf = self.train_ds.n_classes
        self.edm = EDM(
            apply_fn=None,
            schedule=schedule,
            in_node_nf=self.in_node_nf,
            norm_values=tuple(edm_cfg.normalize_factors),
        )
        self.T = schedule.timesteps

        self.out_nf = self.train_ds.num_targets
        self.model = build_predictor(cfg, self.in_node_nf, self.out_nf)
        self.optimizer = make_optimizer(cfg.lr, clip=False)

        n_pad = self.train_ds.padded_nodes
        key = jax.random.PRNGKey(cfg.seed)
        dummy_xh = jnp.zeros((2, n_pad, 3 + self.in_node_nf))
        params = self.model.init(
            key,
            dummy_xh,
            jnp.ones((2, n_pad, 1)),
            jnp.ones((2, n_pad, n_pad)),
            jnp.zeros((2, 1)),
        )
        self.state = TrainState.create(params, self.optimizer)
        if cfg.restore:
            self.state = load_checkpoint(cfg.restore, self.state)

        self._orientation = cfg.dataset == "hetro"
        self._max_nodes = cfg.max_nodes
        # bce mode: the raw-space decision midpoint 0.5 maps to
        # (0.5 - mean) / std per target ONLY when the dataset normalizes
        # targets; with normalize=False y arrives in raw units and the
        # midpoint stays 0.5
        if getattr(cfg, "loss", "l1") == "bce":
            if self.train_ds.cfg.normalize:
                self._y_mid = jnp.asarray(
                    (0.5 - self.train_ds.mean) / self.train_ds.std
                )
            else:
                self._y_mid = jnp.full((len(self.train_ds.mean),), 0.5)
        else:
            self._y_mid = None

        if mesh is not None:
            bs = batch_sharding(mesh)
            rep = replicated_sharding(mesh)
            self._train_step = call_with_rules(
                jax.jit(
                    self._step_impl,
                    donate_argnums=(0,),
                    in_shardings=(rep, bs, bs, bs, bs, bs, rep),
                    out_shardings=(rep, rep),
                ),
                mesh,
                mp_mode,
            )
            self._val_step = call_with_rules(
                jax.jit(
                    self._eval_impl,
                    static_argnames=("t_fix",),
                    in_shardings=(rep, bs, bs, bs, bs, bs, rep),
                ),
                mesh,
                mp_mode,
            )
        else:
            self._train_step = jax.jit(self._step_impl, donate_argnums=(0,))
            self._val_step = jax.jit(self._eval_impl, static_argnames=("t_fix",))

    # ------------------------------------------------------------------

    def _noised_input(self, key, x, h, node_mask, t):
        """q(z_t | x, h) through the frozen EDM's normalize + schedule.

        Mirrors reference sample_edm_t (train_cond_predictor.py:47-61).
        """
        x, h, _ = self.edm.normalize(x, h, node_mask)
        xh = jnp.concatenate([x, h], axis=-1)
        z_t, _, _ = self.edm.sample_zt(key, xh, t, node_mask)
        return z_t

    def _loss_impl(self, params, x, h, n_nodes, y, weight, key, t_fix=None):
        node_mask, edge_mask = M.build_masks(
            n_nodes, self._max_nodes, self._orientation
        )
        x = M.remove_mean_with_mask(x, node_mask)
        b = x.shape[0]
        k_t, k_eps = jax.random.split(key)
        if t_fix is None:
            t_int = jax.random.randint(k_t, (b, 1), 0, self.T + 1).astype(
                jnp.float32
            )
        else:
            t_int = jnp.full((b, 1), float(t_fix))
        t = t_int / self.T
        z_t = self._noised_input(k_eps, x, h, node_mask, t)
        pred = self.model.apply(params, z_t, node_mask, edge_mask, t)
        if self._y_mid is not None:
            # sigmoid BCE with pred as logits: softplus(x) - x*label
            label = (y > self._y_mid).astype(pred.dtype)
            per = jax.nn.softplus(pred) - pred * label
            loss_vec = per.mean(axis=-1)
        else:
            loss_vec = jnp.abs(pred - y).mean(axis=-1)
        wsum = jnp.maximum(weight.sum(), 1.0)
        return (loss_vec * weight).sum() / wsum

    def _step_impl(self, state, x, h, n_nodes, y, weight, key):
        loss, grads = jax.value_and_grad(self._loss_impl)(
            state.params, x, h, n_nodes, y, weight, key
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss},
        )

    def _eval_impl(self, params, x, h, n_nodes, y, weight, key, t_fix=None):
        return self._loss_impl(params, x, h, n_nodes, y, weight, key, t_fix)

    # ------------------------------------------------------------------

    def _batch_arrays(self, batch):
        return (
            jnp.asarray(batch["x"]),
            jnp.asarray(batch["h"]),
            jnp.asarray(batch["n_nodes"]),
            jnp.asarray(batch["y"]),
            jnp.asarray(batch["weight"]),
        )

    def train_epoch(self, rng: np.random.Generator, key) -> float:
        losses = []
        for batch in self.train_ds.iter_batches(self.cfg.batch_size, rng=rng):
            key, sub = jax.random.split(key)
            x, h, n, y, w = self._batch_arrays(batch)
            self.state, m = self._train_step(self.state, x, h, n, y, w, sub)
            losses.append(m["loss"])
        return float(jnp.stack(losses).mean())

    def eval_epoch(self, dataset, key, t_fix=None) -> float:
        losses, weights = [], []
        for batch in dataset.iter_batches(self.cfg.batch_size, shuffle=False):
            key, sub = jax.random.split(key)
            x, h, n, y, w = self._batch_arrays(batch)
            losses.append(
                self._val_step(self.state.params, x, h, n, y, w, sub, t_fix=t_fix)
            )
            weights.append(float(w.sum()))
        w = np.asarray(weights)
        return float(np.asarray(jnp.stack(losses)) @ w / w.sum())

    def fit(self, num_epochs: Optional[int] = None) -> dict:
        cfg = self.cfg
        num_epochs = num_epochs or cfg.num_epochs
        cfg.save()
        logger = MetricsLogger(cfg.exp_dir)
        rng = np.random.default_rng(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed + 1)

        best_val, best_epoch = float("inf"), -1
        for epoch in range(num_epochs):
            t0 = time.time()
            key, k_tr, k_val = jax.random.split(key, 3)
            train_loss = self.train_epoch(rng, k_tr)
            val_loss = self.eval_epoch(self.val_ds, k_val)
            rescaled = self.train_ds.rescale_loss(val_loss)
            logger.log(
                epoch,
                train_loss=train_loss,
                val_loss=val_loss,
                val_l1_rescaled=rescaled,
                epoch_seconds=time.time() - t0,
            )
            print(
                f"[{epoch}] train {train_loss:.4f} | val {val_loss:.4f} "
                f"(L1 rescaled {rescaled:.4f}) | {time.time()-t0:.1f}s"
            )
            if val_loss < best_val:
                best_val, best_epoch = val_loss, epoch
                save_checkpoint(cfg.exp_dir, self.state)

        # reference's fixed-noise-level test sweep (:264-276)
        self.state = load_checkpoint(cfg.exp_dir, self.state)
        key, k_test = jax.random.split(key)
        sweep = {}
        for t_fix in np.linspace(0, self.T, 11):
            sweep[int(t_fix)] = self.eval_epoch(self.test_ds, k_test, t_fix=float(t_fix))
        test_loss = self.eval_epoch(self.test_ds, k_test)
        logger.log(num_epochs, test_loss=test_loss)
        logger.close()
        return {
            "best_val": best_val,
            "best_epoch": best_epoch,
            "test_loss": test_loss,
            "test_sweep": sweep,
        }
