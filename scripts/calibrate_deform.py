"""Calibrate synthetic out-of-plane deformation amplitudes.

Generates a small deformed dataset, then measures (a) ground-truth oracle
stability through the REAL extraction pipeline (xyz -> bonds -> cycle basis
-> ring centers), (b) the dihedral distribution vs the reference windows,
(c) chemistry validity. Target: mol_stable ~100% with a broad dihedral
spread (q99 ~ 35 deg) so partially twisted states are in-distribution.
"""
import argparse
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--dataset", default="cata")
    ap.add_argument("--bend", type=float, default=0.035)
    ap.add_argument("--twist", type=float, default=0.030)
    ap.add_argument("--keep", default="")
    args = ap.parse_args()

    from gaudi_tpu.data.synthetic import generate_dataset

    root = args.keep or tempfile.mkdtemp(prefix="calib_")
    os.makedirs(root, exist_ok=True)
    csv = generate_dataset(
        root, args.dataset, n_molecules=args.n, seed=3,
        bend_scale=args.bend, twist_scale=args.twist,
    )
    import pandas as pd
    df = pd.read_csv(csv)

    from gaudi_tpu.data.mol import load_xyz
    from gaudi_tpu.data.rings import RINGS_LIST, extract_ring_graph
    from gaudi_tpu.eval_chem.stability import (
        analyze_validity_for_molecules, find_triplets_quads, positions2adj,
    )

    names = RINGS_LIST[args.dataset]
    mols, dihedrals, zext = [], [], []
    n_extract_fail = 0
    for name in df["molecule"]:
        m = load_xyz(os.path.join(root, f"{args.dataset}-xyz", name + ".xyz"))
        try:
            rg = extract_ring_graph(m, args.dataset)
        except Exception:
            n_extract_fail += 1
            continue
        centers = rg.centers
        types = np.asarray(rg.ring_types)
        if args.dataset == "hetro":
            # the stability checker expects orientation-doubled input
            # ([rings..., markers...]); use each ring's real orientation
            # handle (mean of its hetero-atom candidates) as the marker
            ori_idx = len(names) - 1
            markers = np.stack([o.mean(axis=0) for o in rg.orientations])
            mols.append((
                np.concatenate([centers, markers], axis=0),
                np.concatenate([types, np.full(len(types), ori_idx)], axis=0),
            ))
        else:
            mols.append((centers, types))
        _, adj = positions2adj(centers[None], types[None], 0.1, args.dataset)
        try:
            _, a4 = find_triplets_quads(adj[0], centers, types, args.dataset)
            dihedrals += [a for _, a in a4]
        except Exception:
            pass
        zext.append(centers[:, 2].max() - centers[:, 2].min())

    print(f"extract failures: {n_extract_fail}/{len(df)}")
    vd, _ = analyze_validity_for_molecules(mols, dataset=args.dataset)
    vd.pop("molecule_stable_bool")
    print("oracle stability:", {k: round(v, 4) for k, v in vd.items()})
    d = np.abs(np.array(dihedrals))
    d0 = d[d <= 90]
    d180 = d[d > 90]
    if len(d0):
        print(f"dihedrals near 0: n={len(d0)} q50={np.quantile(d0,0.5):.1f} "
              f"q90={np.quantile(d0,0.9):.1f} q99={np.quantile(d0,0.99):.1f} max={d0.max():.1f}")
    if len(d180):
        print(f"dihedrals near 180: n={len(d180)} q50={np.quantile(d180,0.5):.1f} "
              f"q10={np.quantile(d180,0.1):.1f} q01={np.quantile(d180,0.01):.1f} min={d180.min():.1f}")
    print(f"ring-center z-extent: q50={np.median(zext):.2f} q90={np.quantile(zext,0.9):.2f}")

    # chemistry oracle on a subset
    from gaudi_tpu.eval_chem import analyze_chemical_validity_for_molecules
    sub = mols[:128]
    if args.dataset == "hetro":
        print("(skipping chem oracle for hetro in calibration)")
    else:
        cd = analyze_chemical_validity_for_molecules(sub, dataset=args.dataset, n_workers=4)
        print("chem oracle:", {k2: round(v, 4) for k2, v in cd.items() if isinstance(v, float)})

    if not args.keep:
        shutil.rmtree(root)


if __name__ == "__main__":
    main()
