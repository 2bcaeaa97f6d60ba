"""Evaluate the property predictor's MAE as a function of noise level t.

Usage:
    python -m gaudi_tpu.cli.eval_predictor --exp-dir prediction_summary/my-pred

Reference counterpart: cond_prediction/eval_cond_predictor.py (MAE-vs-t plot
validating the time conditioning).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from gaudi_tpu.cli.common import load_predictor_from_dir, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp-dir", required=True)
    p.add_argument("--n-levels", type=int, default=11)
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--platform", default="")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_platform(args.platform)
    import jax

    cfg, trainer = load_predictor_from_dir(args.exp_dir)
    dataset = getattr(trainer, f"{args.split}_ds")
    key = jax.random.PRNGKey(args.seed)

    ts = np.linspace(0, trainer.T, args.n_levels)
    maes, maes_rescaled = [], []
    for t_fix in ts:
        mae = trainer.eval_epoch(dataset, key, t_fix=float(t_fix))
        maes.append(mae)
        maes_rescaled.append(float(dataset.rescale_loss(mae)))
        print(f"t={t_fix:7.1f}  MAE={mae:.4f}  (rescaled {maes_rescaled[-1]:.4f})")

    out = {
        "t": ts.tolist(),
        "mae": maes,
        "mae_rescaled": maes_rescaled,
        "split": args.split,
    }
    with open(os.path.join(args.exp_dir, f"mae_vs_t_{args.split}.json"), "w") as f:
        json.dump(out, f, indent=2)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(ts, maes_rescaled, marker="o")
        ax.set_xlabel("diffusion step t")
        ax.set_ylabel("MAE (original units)")
        ax.set_title(f"predictor MAE vs noise level ({args.split})")
        fig.savefig(os.path.join(args.exp_dir, f"mae_vs_t_{args.split}.png"), dpi=120)
        plt.close(fig)
    except Exception:
        pass
    return out


if __name__ == "__main__":
    main()
