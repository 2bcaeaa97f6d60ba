"""Reference-on-synthetic control experiment (VERDICT r4 next-step #1).

Runs the REFERENCE's own PyTorch implementation (/root/reference, imported
in place, never copied) on this repo's synthetic cata dataset, at a matched
reduced config, and scores its samples with THIS repo's judges — the same
judges that score the JAX models. If the reference's raw (no polish, no
rejection) stability plateaus in the same band as the TPU rebuild's at
matched data/config/steps, the raw-axis gap to the paper's Table 1 is a
property of the synthetic-data regime, not of this framework.

Mechanics:
- a minimal module-level rdkit stub satisfies the reference's import-time
  dependency (data/mol.py:105); nothing in the exercised path calls it
  (geometric eval + this repo's chemistry judge need no rdkit),
- `data.aromatic_dataloader.get_paths` is monkeypatched to the synthetic
  csv/xyz (the reference hardcodes absolute paths, :253-271),
- training runs the reference's OWN `train_edm.train_epoch` (its asserts,
  its gradient-clipping queue, its AdamW hyperparameters),
- every --eval-every epochs it samples with the reference's
  `sample_pos_edm` (std 0.7, full T) and appends metrics to quality.jsonl.

Run (CPU, niced, hours):
    nice -n 5 python scripts/ref_control.py --csv runs/r9cs/cata.csv \
        --xyz-root runs/r9cs/cata-xyz --out runs/refctl \
        --n-layers 4 --nf 96 --batch-size 64 --max-hours 6
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def install_rdkit_stub():
    """Import-time-only rdkit stand-in (attribute access never executed by
    the exercised reference code paths)."""

    def make(name):
        m = types.ModuleType(name)

        def ga(attr, _name=name):
            # dunder lookups must fail normally or inspect/copy machinery
            # chokes on module-typed __file__/__wrapped__ etc.
            if attr.startswith("__"):
                raise AttributeError(attr)
            return make(f"{_name}.{attr}")  # PEP 562

        m.__getattr__ = ga
        return m

    for name in ["rdkit", "rdkit.Chem", "rdkit.Chem.Draw",
                 "rdkit.Chem.rdmolops", "rdkit.Chem.rdchem",
                 "rdkit.Chem.AllChem"]:
        sys.modules.setdefault(name, make(name))
    sys.modules["rdkit"].Chem = sys.modules["rdkit.Chem"]
    sys.modules["rdkit.Chem"].Draw = sys.modules["rdkit.Chem.Draw"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--xyz-root", required=True)
    ap.add_argument("--out", default="runs/refctl")
    ap.add_argument("--n-layers", type=int, default=4)
    ap.add_argument("--nf", type=int, default=96)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max-hours", type=float, default=6.0)
    ap.add_argument("--max-epochs", type=int, default=0, help="0 = unlimited")
    ap.add_argument("--eval-every", type=int, default=10, help="epochs")
    ap.add_argument("--eval-samples", type=int, default=256)
    ap.add_argument("--torch-threads", type=int, default=1)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    install_rdkit_stub()
    sys.path.insert(0, REF)

    import numpy as np
    import torch

    torch.set_num_threads(args.torch_threads)
    torch.manual_seed(0)
    np.random.seed(0)

    import data.aromatic_dataloader as adl

    csv, xyz = os.path.abspath(args.csv), os.path.abspath(args.xyz_root)
    adl.get_paths = lambda a: (csv, xyz)

    from utils.args_edm import Args_EDM

    ref_args = Args_EDM().parse_args([])
    ref_args.dataset = "cata"
    ref_args.target_features = "GAP_eV"
    ref_args.n_layers = args.n_layers
    ref_args.nf = args.nf
    ref_args.batch_size = args.batch_size
    ref_args.lr = args.lr
    ref_args.num_workers = 0
    ref_args.dp = False
    ref_args.device = torch.device("cpu")
    ref_args.exp_dir = args.out
    ref_args.restore = None
    ref_args.max_nodes = 11

    from data.aromatic_dataloader import create_data_loaders

    t0 = time.time()
    train_loader, val_loader, _ = create_data_loaders(ref_args)
    print(f"loaders ready in {time.time()-t0:.0f}s "
          f"(train {len(train_loader.dataset)})", flush=True)

    from models_edm import get_model

    model, nodes_dist, prop_dist = get_model(ref_args, train_loader)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"reference model: {args.n_layers}x{args.nf}, {n_params} params",
          flush=True)

    import train_edm as ref_train
    from edm.utils import Queue
    from sampling_edm import sample_pos_edm
    from torch.utils.tensorboard import SummaryWriter

    optimizer = torch.optim.AdamW(
        model.parameters(), lr=ref_args.lr, amsgrad=True, weight_decay=1e-12
    )
    gradnorm_queue = Queue(max_len=50)
    gradnorm_queue.add(3000)
    writer = SummaryWriter(log_dir=args.out)

    # this repo's judges (identical to the ones scoring the JAX models)
    sys.path.insert(0, REPO)
    from gaudi_tpu.eval_chem import (
        analyze_chemical_validity_for_molecules,
        analyze_validity_for_molecules,
    )

    steps_per_epoch = len(train_loader)
    start = time.time()

    def evaluate(epoch):
        model.eval()
        with torch.no_grad():
            n_nodes = nodes_dist.sample(args.eval_samples)
            x, one_hot, node_mask, _ = sample_pos_edm(
                ref_args, model, n_nodes, std=0.7,
            )
        nm = node_mask[..., 0].bool()
        mols = []
        for i in range(x.shape[0]):
            alive = nm[i].numpy()
            mols.append(
                (x[i].numpy()[alive], one_hot[i].argmax(-1).numpy()[alive])
            )
        sd, _ = analyze_validity_for_molecules(mols, dataset="cata")
        cd = analyze_chemical_validity_for_molecules(mols, dataset="cata",
                                                     n_workers=0)
        rec = {
            "epoch": epoch,
            "step": epoch * steps_per_epoch,
            "mol_stable": round(sd["mol_stable"], 4),
            "dist_stable": round(sd["dist_stable"], 4),
            "connected": round(sd["connected"], 4),
            "angels3": round(sd.get("angels3", float("nan")), 4),
            "angels4": round(sd.get("angels4", float("nan")), 4),
            "mol_valid": round(cd["mol_valid"], 4),
            "mol_unique": round(cd["mol_unique"], 4),
            "wall_h": round((time.time() - start) / 3600, 2),
        }
        print(json.dumps(rec), flush=True)
        with open(os.path.join(args.out, "quality.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        model.train()

    deadline = start + args.max_hours * 3600
    epoch = 0
    while time.time() < deadline:
        ref_train.train_epoch(
            epoch, model, train_loader, optimizer, ref_args, writer,
            gradnorm_queue,
        )
        epoch += 1
        if epoch % args.eval_every == 0:
            torch.save(model.state_dict(), os.path.join(args.out, "model.pt"))
            evaluate(epoch)
        if args.max_epochs and epoch >= args.max_epochs:
            break
    torch.save(model.state_dict(), os.path.join(args.out, "model.pt"))
    evaluate(epoch)
    print("REF CONTROL DONE", flush=True)


if __name__ == "__main__":
    main()
