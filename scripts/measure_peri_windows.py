"""Measure peri ANGELS3/ANGELS4 windows from peri ground truth.

The reference ships no angle tables for 'peri' (its angels3_dict has only
cata/hetro keys, utils/helpers.py:52 — reference peri eval would KeyError),
so round 1 limited peri stability to distance+connectivity. This script
closes that gap the way the reference's own cata windows were made:
measure the 3-ring-angle and dihedral distributions over ground-truth
molecules and report per-cluster quantiles. Paste the output into
eval_chem/stability.py (ANGELS3/ANGELS4 "peri" entries).

Peri-condensed systems legitimately contain ~60-degree ring-center angles
(triangle fusions) that the cata windows exclude, so clusters are the
nearest multiple of 60 degrees.
"""
import argparse
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1500)
    ap.add_argument("--qlo", type=float, default=0.001)
    ap.add_argument("--qhi", type=float, default=0.999)
    ap.add_argument("--root", default="")
    args = ap.parse_args()

    from gaudi_tpu.data.mol import load_xyz
    from gaudi_tpu.data.rings import extract_ring_graph
    from gaudi_tpu.data.synthetic import generate_dataset
    from gaudi_tpu.eval_chem.stability import find_triplets_quads, positions2adj

    root = args.root or tempfile.mkdtemp(prefix="peri_win_")
    import pandas as pd
    csv = os.path.join(root, "peri.csv")
    if not os.path.exists(csv):
        print(f"generating {args.n} peri molecules...", flush=True)
        csv = generate_dataset(root, "peri", n_molecules=args.n, seed=17)
    df = pd.read_csv(csv)

    a3 = defaultdict(list)
    a4_all = []
    for name in df["molecule"]:
        rg = extract_ring_graph(
            load_xyz(os.path.join(root, "peri-xyz", name + ".xyz")), "peri"
        )
        centers = rg.centers
        types = np.asarray(rg.ring_types)
        _, adj = positions2adj(centers[None], types[None], 0.1, "peri")
        try:
            t3, t4 = find_triplets_quads(adj[0], centers, types, "peri")
        except Exception:
            continue
        for sym, ang in t3:
            cluster = int(np.clip(np.round(ang / 60.0), 1, 5) * 60)
            a3[(sym, cluster)].append(ang)
        for _, d in t4:
            a4_all.append(abs(d))

    print("\nANGELS3['peri'] measured clusters (qlo/qhi quantiles):")
    table = {}
    for (sym, cluster), vals in sorted(a3.items()):
        v = np.array(vals)
        lo, hi = np.quantile(v, args.qlo), np.quantile(v, args.qhi)
        table.setdefault(sym, {})[str(cluster)] = (float(lo), float(hi))
        print(f"  {sym} ~{cluster}: n={len(v)} lo={lo:.3f} hi={hi:.3f} "
              f"(min={v.min():.2f} max={v.max():.2f})")
    print(repr(table))

    d = np.array(a4_all)
    near0 = d[d <= 90]
    near180 = d[d > 90]
    print(f"\nANGELS4['peri'] (n0={len(near0)}, n180={len(near180)}):")
    q0 = float(np.quantile(near0, args.qhi)) if len(near0) else 0.0
    q180 = float(np.quantile(near180, args.qlo)) if len(near180) else 180.0
    print(f"  '0': {q0:.3f}  (near-0 dihedral {args.qhi} quantile)")
    print(f"  '180': {q180:.3f} (near-180 dihedral {args.qlo} quantile)")
    print(repr({"0": q0, "180": q180}))


if __name__ == "__main__":
    main()
