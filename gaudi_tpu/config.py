"""Typed experiment configs with JSON round-trip.

Replaces the reference's argparse-subclass bundles (utils/args_edm.py:4-51,
cond_prediction/prediction_args.py:5-51) and the args.txt dump/reload
workflow (train_edm.py:207-208 <-> utils/helpers.py:204-224): a checkpoint
directory is self-describing via its args.json, and `load(exp_dir)` restores
the exact experiment configuration.

Defaults are the reference's defaults.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

from gaudi_tpu.data.dataset import DatasetConfig


@dataclasses.dataclass
class EDMConfig:
    # data
    dataset: str = "cata"
    csv_file: str = ""
    xyz_root: str = ""
    max_nodes: int = 11
    target_features: str = "GAP_eV"
    normalize: bool = True
    sample_rate: float = 1.0

    # training (reference utils/args_edm.py:15-26)
    name: str = "cata-test"
    restore: Optional[str] = None
    lr: float = 1e-3
    # linear lr warmup 0 -> lr over this many steps; 0 = reference behavior
    # (constant lr). Used for continuations restored from weights-only
    # artifacts, where the optimizer's second moments restart cold.
    lr_warmup_steps: int = 0
    num_epochs: int = 1000
    batch_size: int = 256
    clip_grad: bool = True

    # model (reference utils/args_edm.py:27-37; mode is the EGNN_dynamics
    # constructor knob, reference edm/egnn/models.py:21 — "egnn_dynamics"
    # or the non-equivariant "gnn_dynamics" ablation)
    model: str = "egnn_dynamics"
    n_layers: int = 9
    nf: int = 192
    tanh: bool = True
    attention: bool = True
    coords_range: float = 4.0
    norm_constant: float = 1.0
    sin_embedding: bool = False
    inv_sublayers: int = 1
    normalization_factor: float = 1.0
    aggregation_method: str = "sum"

    # diffusion (reference utils/args_edm.py:38-48)
    diffusion_steps: int = 1000
    diffusion_noise_schedule: str = "polynomial_2"
    diffusion_noise_precision: float = 1e-5
    diffusion_loss_type: str = "l2"
    normalize_factors: tuple = (3.0, 4.0, 10.0)

    # infra
    save_dir: str = "summary"
    seed: int = 0
    dtype: str = "float32"  # compute dtype for the network ("bfloat16" opts in)
    use_fused: bool = False  # deprecated no-op (Pallas path removed; PERF.md post-mortem); kept so old args.json files load
    # EMA of weights for sampling. The reference defines an EMA helper but
    # never enables it (SURVEY §2.6); 0.0 reproduces that. Nonzero (e.g.
    # 0.999) is the standard diffusion-quality upgrade.
    ema_decay: float = 0.0
    # Low-t emphasis for fine-tuning: this fraction of each training batch
    # draws t_int from U[0, t_bias_cap*T] instead of U[0, T], sharpening
    # the learned score near the data manifold (final-geometry precision,
    # SDEdit polish quality). 0.0 reproduces the reference's uniform-t
    # loss (en_diffusion.py:702-705) exactly.
    t_bias_frac: float = 0.0
    t_bias_cap: float = 0.1
    # Planarity-weighted train sampling (beyond reference). The reference's
    # COMPAS-era data is duplicate-heavy and implicitly oversamples easy
    # near-planar molecules; identity-deduplication (round-5 datasets)
    # removes that weighting and uniform sampling over the deduped identity
    # space — dominated by hard fjord/helicene shapes — slows raw-geometry
    # learning dramatically (QUALITY.md round-5). planar_boost mixes the
    # uniform epoch distribution with an ease-weighted one:
    #   p_i ∝ (1-boost)·uniform + boost·exp(-(rms_i - rms_min)/tau)
    # where rms_i is the per-molecule best-fit-plane RMS of the ring
    # centers. 0.0 reproduces plain shuffled epochs (reference behavior);
    # draws are with replacement so the holdout/novelty semantics are
    # unchanged (train identities only).
    planar_boost: float = 0.0
    planar_tau: float = 0.1
    # Conditional EDM / classifier-free guidance (beyond reference: the
    # reference's context plumbing exists in its EGNN_dynamics but no live
    # config conditions the diffusion model — SURVEY §2.6). Comma-separated
    # subset of target_features to condition on; the trainer appends an
    # is-conditioned indicator channel and drops the whole context to the
    # null token (zeros) with probability context_dropout per sample, which
    # is what makes CFG sampling (diffusion/cfg.py with_cfg) well-posed.
    context_features: str = ""
    context_dropout: float = 0.1

    @property
    def exp_dir(self) -> str:
        return os.path.join(self.save_dir, self.name)

    def data_config(self) -> DatasetConfig:
        return DatasetConfig(
            dataset=self.dataset,
            csv_file=self.csv_file,
            xyz_root=self.xyz_root,
            max_nodes=self.max_nodes,
            target_features=self.target_features,
            normalize=self.normalize,
            sample_rate=self.sample_rate,
        )

    def save(self, exp_dir: Optional[str] = None) -> str:
        exp_dir = exp_dir or self.exp_dir
        os.makedirs(exp_dir, exist_ok=True)
        path = os.path.join(exp_dir, "args.json")
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)
        return path

    @classmethod
    def load(cls, exp_dir: str):
        with open(os.path.join(exp_dir, "args.json")) as f:
            d = json.load(f)
        d["normalize_factors"] = tuple(d.get("normalize_factors", (3, 4, 10)))
        cfg = cls(**d)
        return dataclasses.replace(cfg, restore=exp_dir)


@dataclasses.dataclass
class PredictorConfig:
    # data
    dataset: str = "cata"
    csv_file: str = ""
    xyz_root: str = ""
    max_nodes: int = 11
    target_features: str = "LUMO_eV,GAP_eV,Erel_eV,aIP_eV,aEA_eV"
    normalize: bool = True
    sample_rate: float = 1.0

    # training (reference prediction_args.py:33-40)
    name: str = "cond-predictor"
    restore: Optional[str] = None
    lr: float = 6e-4
    num_epochs: int = 1000
    batch_size: int = 256

    # model (reference prediction_args.py:42-48)
    n_layers: int = 12
    nf: int = 196
    tanh: bool = True
    attention: bool = True
    coords_range: float = 4.0
    norm_constant: float = 1.0
    normalization_factor: float = 1.0

    save_dir: str = "prediction_summary"
    seed: int = 0
    dtype: str = "float32"
    # "l1" reproduces the reference (train_cond_predictor.py:64-81);
    # "bce" treats the (single or multi) target as binary labels and trains
    # sigmoid-BCE on the head as logits — for validity classifiers trained
    # on labeled synthetic data (guidance then ascends the logit).
    loss: str = "l1"

    @property
    def exp_dir(self) -> str:
        return os.path.join(self.save_dir, self.name)

    def data_config(self) -> DatasetConfig:
        return DatasetConfig(
            dataset=self.dataset,
            csv_file=self.csv_file,
            xyz_root=self.xyz_root,
            max_nodes=self.max_nodes,
            target_features=self.target_features,
            normalize=self.normalize,
            sample_rate=self.sample_rate,
        )

    def save(self, exp_dir: Optional[str] = None) -> str:
        exp_dir = exp_dir or self.exp_dir
        os.makedirs(exp_dir, exist_ok=True)
        path = os.path.join(exp_dir, "args.json")
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)
        return path

    @classmethod
    def load(cls, exp_dir: str):
        with open(os.path.join(exp_dir, "args.json")) as f:
            d = json.load(f)
        cfg = cls(**d)
        return dataclasses.replace(cfg, restore=exp_dir)
