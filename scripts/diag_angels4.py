"""Diagnose the angels4 (dihedral) stability bottleneck.

Samples from a trained EDM checkpoint and compares failing dihedral
statistics against the ground-truth training data to locate where the
71.7% angels4 rate comes from (VERDICT.md weak #1).
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def quad_stats(x, t, dataset="cata"):
    """Per-molecule: list of (dihedral, min_bend_angle, z_range_of_quad)."""
    from gaudi_tpu.eval_chem.stability import (
        _angle3, _angle4, find_triplets_quads, positions2adj,
    )

    x = np.asarray(x, np.float64)
    t = np.asarray(t)
    if t.ndim == 2:
        t = t.argmax(1)
    _, adj = positions2adj(x[None], t[None], 0.1, dataset)
    import networkx as nx
    g = nx.from_numpy_array(adj[0])
    if not nx.is_connected(g):
        return None
    _, a4 = find_triplets_quads(adj[0], x, t, dataset)
    # recompute quads with geometry detail
    out = []
    from gaudi_tpu.eval_chem.stability import find_triplets_quads as ftq
    # reuse a4 but we need the quad indices; re-enumerate
    triplets = []
    for n1, n2 in nx.bfs_edges(g, 0):
        for n3 in g.neighbors(n1):
            if n3 != n2:
                triplets.append((n2, n1, n3))
        for n3 in g.neighbors(n2):
            if n3 != n1:
                triplets.append((n1, n2, n3))
    triplets = {(a, b, c) if a < c else (c, b, a) for a, b, c in triplets}
    angular = [tr for tr in triplets if not 170 < _angle3(x[list(tr)]) < 190]
    quads = []
    for n1, n2, n3 in angular:
        for n4 in g.neighbors(n1):
            if n4 not in (n2, n3) and not 175 < _angle3(x[[n4, n1, n2]]) < 185:
                quads.append((n4, n1, n2, n3))
        for n4 in g.neighbors(n3):
            if n4 not in (n1, n2) and not 175 < _angle3(x[[n2, n3, n4]]) < 185:
                quads.append((n1, n2, n3, n4))
    quads = {(a, b, c, d) if a < d else (d, c, b, a) for a, b, c, d in quads}
    for q in quads:
        p = x[list(q)]
        di = _angle4(p)
        b1 = _angle3(p[:3])
        b2 = _angle3(p[1:])
        out.append((di, min(b1, b2), float(p[:, 2].max() - p[:, 2].min())))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-dir", default="runs/longrun/summary/longrun-edm")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--std", type=float, default=0.7)
    ap.add_argument("--polish", type=int, default=0)
    ap.add_argument("--polish-t", type=float, default=0.15)
    ap.add_argument("--noise", type=float, default=0.3)
    ap.add_argument("--decay", type=float, default=0.6)
    args = ap.parse_args()

    from gaudi_tpu.cli.common import load_edm_from_dir, setup_platform
    setup_platform()
    import jax

    cfg, trainer = load_edm_from_dir(args.exp_dir)
    from gaudi_tpu.cli.eval_validity import sample_molecules
    mols, dt = sample_molecules(
        trainer, args.n, args.n, args.std, seed=7,
        polish=args.polish, polish_t=args.polish_t,
        polish_noise=args.noise, polish_decay=args.decay,
    )
    print(f"sampled {len(mols)} in {dt:.1f}s")

    from gaudi_tpu.eval_chem.stability import check_stability

    LO, HI = 135.031 * 0.9, 43.943 * 1.1  # pass if d >= LO or d <= HI
    fail_d, pass_d, fail_bend, fail_z = [], [], [], []
    n_a4_fail = n_a3_fail = 0
    for x, t in mols:
        r = check_stability(x, t, dataset=cfg.dataset)
        if not r["connected"]:
            continue
        if not r["angels3"]:
            n_a3_fail += 1
        qs = quad_stats(x, t, cfg.dataset)
        if qs is None:
            continue
        bad = [q for q in qs if not (q[0] >= LO or q[0] <= HI)]
        if bad:
            n_a4_fail += 1
            for d, bend, zr in bad:
                fail_d.append(d)
                fail_bend.append(bend)
                fail_z.append(zr)
        for d, _, _ in qs:
            pass_d.append(d)

    print(f"molecules with angels4 fail: {n_a4_fail}/{len(mols)}  angels3 fail: {n_a3_fail}")
    fd = np.array(fail_d)
    if len(fd):
        print(f"failing dihedrals: n={len(fd)} median={np.median(fd):.1f} "
              f"q10={np.quantile(fd,0.1):.1f} q90={np.quantile(fd,0.9):.1f}")
        print("  histogram (48..122 deg):",
              np.histogram(fd, bins=np.linspace(48, 122, 9))[0])
        fb = np.array(fail_bend)
        print(f"failing-quad min bend angle: median={np.median(fb):.1f} "
              f"q10={np.quantile(fb,0.1):.1f} q90={np.quantile(fb,0.9):.1f}")
        fz = np.array(fail_z)
        print(f"failing-quad z-range: median={np.median(fz):.3f} q90={np.quantile(fz,0.9):.3f}")
    ad = np.array(pass_d)
    print(f"all dihedrals: n={len(ad)} near180={np.mean(ad>=LO):.3f} near0={np.mean(ad<=HI):.3f} "
          f"mid={np.mean((ad>HI)&(ad<LO)):.4f}")

    # sample z-statistics
    zs = []
    for x, t in mols[:200]:
        n = len(t) if np.ndim(t) == 1 else t.shape[0]
        zr = np.asarray(x)[:, 2]
        zs.append(zr.max() - zr.min())
    print(f"sample molecule z-extent: median={np.median(zs):.3f} q90={np.quantile(zs,0.9):.3f}")

    # ground truth comparison
    from gaudi_tpu.data.dataset import DatasetConfig, create_datasets
    dcfg = DatasetConfig(dataset=cfg.dataset, csv_file=cfg.csv_file, xyz_root=cfg.xyz_root,
                         target_features=cfg.target_features)
    tr, _, _ = create_datasets(dcfg)
    rng = np.random.default_rng(0)
    idx = rng.choice(len(tr), size=min(512, len(tr)), replace=False)
    gt_fail = 0
    gt_d = []
    gt_z = []
    for i in idx:
        b = tr.collate(np.array([i]), rng)
        x = np.asarray(b["x"][0]); h = np.asarray(b["h"][0]); nm = np.asarray(b["node_mask"][0])
        n = int(nm.sum())
        x, h = x[:n], h[:n]
        qs = quad_stats(x, h, cfg.dataset)
        if qs is None:
            continue
        bad = [q for q in qs if not (q[0] >= LO or q[0] <= HI)]
        if bad:
            gt_fail += 1
        gt_d += [q[0] for q in qs]
        gt_z.append(float(x[:, 2].max() - x[:, 2].min()))
    gd = np.array(gt_d)
    print(f"ground truth: angels4 fail {gt_fail}/{len(idx)}; n_quads={len(gd)}; "
          f"dihedral mid-frac={np.mean((gd>HI)&(gd<LO)):.4f}; "
          f"near180={np.mean(gd>=LO):.3f} near0={np.mean(gd<=HI):.3f}; "
          f"z-extent median={np.median(gt_z):.3f}")


if __name__ == "__main__":
    main()
