"""Merge runs/r5h (16k hetro) + runs/r5h_lab VALID=1 subset into one root.

The labeled classifier dataset (seed 1) was generated with the same
physics as the training set (seed 0); its chemically-valid rows are
legitimate extra EDM training data (~6.7k molecules, disjoint seed).
Molecule names collide across the two runs (both number from 0), so lab
rows are renamed with a 9xxxxx index offset; xyz files are hardlinked.

Usage: python scripts/merge_hetro.py --out runs/r5h_merged
"""
import argparse
import os

import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="runs/r5h")
    ap.add_argument("--b", default="runs/r5h_lab")
    ap.add_argument("--out", default="runs/r5h_merged")
    args = ap.parse_args()

    out_xyz = os.path.join(args.out, "hetro-xyz")
    os.makedirs(out_xyz, exist_ok=True)

    da = pd.read_csv(os.path.join(args.a, "hetro.csv"))
    for name in da["molecule"]:
        dst = os.path.join(out_xyz, name + ".xyz")
        if not os.path.exists(dst):
            os.link(os.path.join(args.a, "hetro-xyz", name + ".xyz"), dst)

    db = pd.read_csv(os.path.join(args.b, "hetro.csv"))
    db = db[db["VALID"] == 1.0].drop(columns=["VALID"]).reset_index(drop=True)
    renames = []
    for name in db["molecule"]:
        idx = int(name.rsplit("_", 1)[1])
        new = f"hetro_{900000 + idx:06d}"
        renames.append(new)
        dst = os.path.join(out_xyz, new + ".xyz")
        if not os.path.exists(dst):
            os.link(os.path.join(args.b, "hetro-xyz", name + ".xyz"), dst)
    db["molecule"] = renames

    merged = pd.concat([da, db], ignore_index=True)
    merged.to_csv(os.path.join(args.out, "hetro.csv"), index=False)
    print(f"merged: {len(da)} + {len(db)} = {len(merged)} molecules -> {args.out}")


if __name__ == "__main__":
    main()
