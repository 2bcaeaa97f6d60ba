"""Merge several hetro data roots into one EDM training root.

The labeled classifier dataset (seed 1) was generated with the same
physics as the training set (seed 0); its chemically-valid rows are
legitimate extra EDM training data (~6.7k molecules, disjoint seed).
Extra plain runs (e.g. seed 2) stack the same way. Molecule names
collide across runs (each numbers from 0), so every source carries an
index offset making names unique; xyz files are hardlinked. Sources
with a VALID column (labeled runs) are filtered to VALID==1 and the
column is dropped so all sources share the plain-csv schema.

Usage:
  python scripts/merge_hetro.py --out runs/r5h_merged \
      --src runs/r5h:0 --src runs/r5h_lab:900000 --src runs/r5h2:500000
"""
import argparse
import os

import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", action="append", required=True,
                    help="root:offset (offset added to molecule indices)")
    ap.add_argument("--out", default="runs/r5h_merged")
    args = ap.parse_args()

    out_xyz = os.path.join(args.out, "hetro-xyz")
    os.makedirs(out_xyz, exist_ok=True)

    frames = []
    for spec in args.src:
        root, _, off = spec.partition(":")
        off = int(off or 0)
        df = pd.read_csv(os.path.join(root, "hetro.csv"))
        if "VALID" in df.columns:
            df = df[df["VALID"] == 1.0].drop(columns=["VALID"])
            df = df.reset_index(drop=True)
        renames = []
        for name in df["molecule"]:
            idx = int(name.rsplit("_", 1)[1])
            new = f"hetro_{off + idx:06d}" if off else name
            renames.append(new)
            dst = os.path.join(out_xyz, new + ".xyz")
            if not os.path.exists(dst):
                os.link(os.path.join(root, "hetro-xyz", name + ".xyz"), dst)
        df["molecule"] = renames
        frames.append(df)
        print(f"{root}: +{len(df)} molecules (offset {off})")

    merged = pd.concat(frames, ignore_index=True)
    merged.to_csv(os.path.join(args.out, "hetro.csv"), index=False)
    print(f"merged: {len(merged)} molecules -> {args.out}")


if __name__ == "__main__":
    main()
