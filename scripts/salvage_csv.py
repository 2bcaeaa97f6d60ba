"""Rebuild <root>/<dataset>.csv from an interrupted generate_dataset run.

generate_dataset (gaudi_tpu/data/synthetic.py) streams accepted molecules to
<root>/<dataset>-xyz/*.xyz but writes the csv only at the very end, so a
timeout kill loses hours of accepted geometry. Every xyz on disk corresponds
to exactly one accepted row, and every csv column is recomputable from the
geometry:

- n_rings: extract_ring_graph — the same ground-truth extractor the
  dataset layer runs (data/dataset.py:82-88), so the salvaged column is
  definitionally what the loader's n_rings prefilter expects. Fallback for
  geometries the extractor rejects: cyclomatic number E - V + 1 of the
  covalent graph (equals the bounded-face count for the generator's
  connected planar patches, but over-counts when hetero substitution
  creates extra covalent contacts — measured on B-rich invalid skeletons).
- Hueckel targets: _huckel_targets is deterministic from geometry apart
  from its ~0.02 eV synthetic measurement noise (Erel is pure noise); we
  redraw that noise from a fresh rng, which is statistically equivalent.
- VALID (labeled mode): _skeleton_chemically_valid — the generator's
  roundtrip filter guaranteed the saved geometry reproduces its own
  verdict, so recomputation is faithful by construction.

Truncated last-file writes are skipped. Rows are sorted by generation index
(the filename) so dataset splits stay deterministic.
"""
import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaudi_tpu.data.mol import connectivity_matrix, load_xyz
from gaudi_tpu.data.rings import extract_ring_graph
from gaudi_tpu.data.synthetic import _huckel_targets, _skeleton_chemically_valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--labeled", action="store_true")
    ap.add_argument("--seed", type=int, default=0, help="noise redraw seed")
    args = ap.parse_args()

    xyz_dir = os.path.join(args.root, f"{args.dataset}-xyz")
    names = sorted(os.listdir(xyz_dir))
    rng = np.random.default_rng(args.seed)
    rows, skipped = [], 0
    for k, fname in enumerate(names):
        if not fname.endswith(".xyz"):
            continue
        try:
            path = os.path.join(xyz_dir, fname)
            with open(path) as f:
                declared = int(f.readline().split()[0])
            mol = load_xyz(path)
            if len(mol.elements) != declared:
                raise ValueError(
                    f"truncated: header {declared} vs {len(mol.elements)} atoms"
                )
            try:
                n_rings = int(extract_ring_graph(mol, args.dataset).n_rings)
            except Exception:
                adj = connectivity_matrix(mol).astype(bool)
                n_edges = int(adj.sum()) // 2
                n_rings = n_edges - len(mol.elements) + 1
            if n_rings < 1:
                raise ValueError("acyclic/disconnected parse")
            row = {"molecule": fname[:-4], "n_rings": n_rings}
            row.update(_huckel_targets(mol, rng))
            if args.labeled:
                row["VALID"] = float(_skeleton_chemically_valid(mol, args.dataset))
        except Exception as e:  # truncated tail write, partial file
            print(f"skip {fname}: {e}")
            skipped += 1
            continue
        rows.append(row)
        if (k + 1) % 2000 == 0:
            print(f"{k + 1}/{len(names)}", flush=True)

    df = pd.DataFrame(rows)
    csv_path = os.path.join(args.root, f"{args.dataset}.csv")
    df.to_csv(csv_path, index=False)
    if args.labeled:
        print(f"VALID fraction: {df['VALID'].mean():.3f}")
    print(f"wrote {csv_path}: {len(df)} rows, {skipped} skipped")


if __name__ == "__main__":
    main()
