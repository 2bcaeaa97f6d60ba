"""Geometric stability checker for generated ring graphs.

Rebuild of reference analyze/analyze.py:21-177 + utils/helpers.py:11-196.
The empirical windows (ring-pair distance ranges, 3-ring angle quantiles,
dihedral quantiles) are measured statistics of the training datasets and are
kept numerically identical to the reference so 'stable%' is comparable.

Performance redesign: the reference computes the distance/adjacency test with
a per-batch x per-pair Python loop (utils/helpers.py:173-196). Here ring-pair
windows are precompiled into [K, K] lo/hi matrices per dataset, so a whole
batch is checked with three numpy broadcasts. Only the (tiny) per-molecule
graph traversals (connectivity, angle triplet/quad enumeration) stay in
Python/networkx.
"""

from __future__ import annotations

from functools import lru_cache

import networkx as nx
import numpy as np

from gaudi_tpu.data.rings import RINGS_LIST

# ---------------------------------------------------------------------------
# Empirical windows (values identical to reference utils/helpers.py:11-162)
# ---------------------------------------------------------------------------

RING_DISTANCES = {
    "cata": {"Bn-Bn": (2.42, 2.48)},
    "peri": {"Bn-Bn": (2.42, 2.48)},
    "hetro": {
        "Pl-Bn": (2.13, 2.18), "Th-Bn": (2.22, 2.28), "Bn-Bn": (2.42, 2.48),
        "Fu-Bn": (2.12, 2.17), "Fu-Cbd": (1.61, 1.70), "Cbd-Bn": (1.87, 1.95),
        "Bn-Bl": (2.18, 2.26), "Pd-Bn": (2.33, 2.39), "Db-Bn": (2.51, 2.63),
        "Pz-Bn": (2.38, 2.46), "Pz-Db": (2.48, 2.61), "Bz-Bn": (2.42, 2.55),
        "Th-Bz": (2.22, 2.34), "Db-Bl": (2.27, 2.40), "Pl-Cbd": (1.62, 1.70),
        "Db-Cbd": (1.93, 2.09), "Th-Bl": (1.99, 2.06), "Fu-Db": (2.22, 2.32),
        "Db-Bz": (2.53, 2.69), "Th-Fu": (1.93, 1.99), "Pd-Bl": (2.10, 2.17),
        "Pz-Pd": (2.29, 2.37), "Pz-Bz": (2.38, 2.53), "Bl-Bl": (1.96, 2.06),
        "Db-Db": (2.53, 2.78), "Th-Db": (2.31, 2.43), "Cbd-Bz": (1.83, 2.00),
        "Bz-Bl": (2.20, 2.32), "Fu-Bz": (2.11, 2.24), "Fu-Fu": (1.86, 1.89),
        "Pd-Db": (2.45, 2.54), "Th-Pd": (2.13, 2.18), "Pz-Bl": (2.14, 2.24),
        "Pz-Fu": (2.08, 2.15), "Pz-Pl": (2.09, 2.17), "Pd-Bz": (2.33, 2.46),
        "Th-Cbd": (1.70, 1.78), "Th-Pz": (2.17, 2.26), "Pl-Pd": (2.05, 2.09),
        "Th-Pl": (1.95, 1.99), "Bz-Bz": (2.47, 2.61), "Pz-Pz": (2.33, 2.42),
        "Pd-Fu": (2.03, 2.08), "Fu-Bl": (1.89, 1.97), "Pl-Fu": (1.87, 1.90),
        "Pl-Bl": (1.91, 1.98), "Pl-Db": (2.22, 2.34), "Th-Th": (2.03, 2.08),
        "Cbd-Cbd": (1.25, 1.46), "Pl-Bz": (2.13, 2.25), "Pd-Cbd": (1.80, 1.84),
        "Pz-Cbd": (1.84, 1.93), "Pl-Pl": (1.89, 1.91), "Pd-Pd": (2.25, 2.35),
        "Cbd-Bl": (1.65, 1.75),
    },
}

ANGELS3 = {
    "cata": {
        "Bn": {
            "120": (105.772, 133.193),
            "180": (177.333, 183.089),
            "240": (227.120, 255.250),
        }
    },
    # peri: the reference ships NO angle tables for 'peri' (its angels3_dict
    # has only cata/hetro keys, utils/helpers.py:52 — reference peri eval
    # would KeyError). These windows are measured from this framework's own
    # peri ground truth exactly the way the reference's cata tables were
    # made: per-cluster 0.1%/99.9% quantiles over ~1,200 molecules
    # (scripts/measure_peri_windows.py). Peri-condensed systems contain
    # ~60-degree ring-center angles (triangle fusions) that cata excludes.
    "peri": {
        "Bn": {
            "60": (56.469, 65.185),
            "120": (112.717, 126.908),
            "180": (151.060, 179.936),
        }
    },
    "hetro": {
        "Bl": {"140": (127.3096694946289, 145.93600463867188)},
        "Bn": {
            "120": (108.33101654052734, 127.21441650390625),
            "180": (170.7755126953125, 180.0),
        },
        "Db": {"180": (156.42091369628906, 180.0)},
        "Fu": {"140": (135.90780639648438, 153.3458251953125)},
        "Pl": {"140": (134.00990295410156, 151.88079833984375)},
        "Bz": {
            "120": (108.01634216308594, 123.69662475585938),
            "180": (169.33651733398438, 179.944580078125),
        },
        "Pz": {"180": (168.29324340820312, 180.0)},
        "Pd": {
            "120": (108.94857788085938, 126.54322052001953),
            "180": (168.7400360107422, 179.96141052246094),
        },
        "Th": {"140": (126.71401977539062, 142.5613555908203)},
        "Cbd": {"180": (155.19215393066406, 180.0)},
    },
}
# Peri dihedrals are deliberately NOT windowed (no ANGELS4['peri']): the
# measured |dihedral| distribution over peri ground truth is continuous up
# to 90 degrees (dense patches put quad paths on short lever arms where
# modest out-of-plane deformation swings the dihedral freely), so a
# near-0/near-180 window model would misclassify real geometry. This
# follows the reference's own precedent of skipping the dihedral check for
# its non-planar-friendly dataset (check_angels4 skips 'hetro',
# analyze/analyze.py:39-47).

ANGELS4 = {
    "cata": {"0": 43.943, "180": 135.031},
    "hetro": {"0": 42.01443862915039, "180": 139.9242706298828},
}


@lru_cache(maxsize=None)
def _distance_window_matrices(dataset: str):
    """[K, K] lo/hi matrices; 0-width window for unknown type pairs."""
    names = RINGS_LIST[dataset]
    k = len(names)
    lo = np.full((k, k), np.inf)
    hi = np.full((k, k), -np.inf)
    table = RING_DISTANCES[dataset]
    for key, (a, b) in table.items():
        s1, s2 = key.split("-")
        if s1 in names and s2 in names:
            i, j = names.index(s1), names.index(s2)
            lo[i, j] = lo[j, i] = a
            hi[i, j] = hi[j, i] = b
    min_dist = min(v[0] for v in table.values())
    return lo, hi, min_dist


def coord2distances(x: np.ndarray) -> np.ndarray:
    """[B, N, 3] -> [B, N, N] pairwise distances."""
    diff = x[:, :, None, :] - x[:, None, :, :]
    return np.sqrt((diff**2).sum(-1))


def positions2adj(
    x: np.ndarray, ring_types: np.ndarray, tol: float = 0.1, dataset: str = "cata"
):
    """Batched ring adjacency from type-pair distance windows.

    x [B, N, 3], ring_types [B, N] int (or [B, N, K] one-hot) ->
    (dist [B, N, N], adj [B, N, N]). Vectorized equivalent of reference
    utils/helpers.py:173-196.
    """
    if ring_types.ndim == 3:
        ring_types = ring_types.argmax(-1)
    ring_types = ring_types.astype(np.int64)
    dist = coord2distances(np.asarray(x, np.float64))
    lo, hi, _ = _distance_window_matrices(dataset)
    pair_lo = lo[ring_types[:, :, None], ring_types[:, None, :]]
    pair_hi = hi[ring_types[:, :, None], ring_types[:, None, :]]
    adj = (dist > pair_lo * (1 - tol)) & (dist < pair_hi * (1 + tol))
    b, n = ring_types.shape
    adj &= ~np.eye(n, dtype=bool)[None]
    return dist, adj.astype(np.float64)


def _angle3(p: np.ndarray) -> float:
    v1, v2 = p[0] - p[1], p[2] - p[1]
    cos = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2) + 1e-12)
    a = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
    return a if a >= 0 else a + 360.0


def _angle4(p: np.ndarray) -> float:
    """Dihedral (praxeolitic), |deg| — reference analyze.py:243-270."""
    b0 = -(p[1] - p[0])
    b1 = p[2] - p[1]
    b2 = p[3] - p[2]
    b1 = b1 / (np.linalg.norm(b1) + 1e-12)
    v = b0 - np.dot(b0, b1) * b1
    w = b2 - np.dot(b2, b1) * b1
    xx = np.dot(v, w)
    yy = np.dot(np.cross(b1, v), w)
    return abs(np.degrees(np.arctan2(yy, xx)))


def find_triplets_quads(adj: np.ndarray, x: np.ndarray, ring_types: np.ndarray, dataset="cata"):
    """Angle triplets (center-typed) + dihedral quads from the ring graph.

    Mirrors reference analyze/analyze.py:273-319 (BFS-edge enumeration,
    dedup by endpoint ordering, linear-triplet exclusion for quads).
    """
    names = RINGS_LIST[dataset]
    if ring_types.ndim == 2:
        ring_types = ring_types.argmax(1)
    rings = [names[int(i)] for i in ring_types]
    g = nx.from_numpy_array(adj)
    triplets = []
    for n1, n2 in nx.bfs_edges(g, 0):
        for n3 in g.neighbors(n1):
            if n3 != n2:
                triplets.append((n2, n1, n3))
        for n3 in g.neighbors(n2):
            if n3 != n1:
                triplets.append((n1, n2, n3))
    triplets = {(a, b, c) if a < c else (c, b, a) for a, b, c in triplets}
    angels3 = [(rings[t[1]], _angle3(x[list(t)])) for t in triplets]

    angular = [t for t in triplets if not 170 < _angle3(x[list(t)]) < 190]
    quads = []
    for n1, n2, n3 in angular:
        for n4 in g.neighbors(n1):
            if n4 not in (n2, n3) and not 175 < _angle3(x[[n4, n1, n2]]) < 185:
                quads.append((n4, n1, n2, n3))
        for n4 in g.neighbors(n3):
            if n4 not in (n1, n2) and not 175 < _angle3(x[[n2, n3, n4]]) < 185:
                quads.append((n1, n2, n3, n4))
    quads = {(a, b, c, d) if a < d else (d, c, b, a) for a, b, c, d in quads}
    angels4 = [
        ([rings[q[i]] for i in range(4)], _angle4(x[list(q)])) for q in quads
    ]
    return angels3, angels4


def check_angels3(angels3, tol=0.1, dataset="cata") -> bool:
    """Every 3-ring angle falls in one of its center-type windows."""
    if dataset not in ANGELS3:
        return True
    table = ANGELS3[dataset]
    for symbol in {s for s, _ in angels3}:
        vals = np.array([a for s, a in angels3 if s == symbol])
        ok = np.zeros(len(vals), bool)
        for lo, hi in table[symbol].values():
            ok |= (lo * (1 - tol) <= vals) & (vals <= hi * (1 + tol))
        if not ok.all():
            return False
    return True


def check_angels4(angels4, tol=0.1, dataset="cata") -> bool:
    """Dihedrals near 0 or 180 (planarity); hetro skips (reference :39-47)."""
    if len(angels4) == 0 or dataset == "hetro" or dataset not in ANGELS4:
        return True
    vals = np.array([a for _, a in angels4])
    lo = ANGELS4[dataset]["180"] * (1 - tol)
    hi = ANGELS4[dataset]["0"] * (1 + tol)
    return bool(np.all((vals >= lo) | (vals <= hi)))


def check_stability(
    positions: np.ndarray, ring_types: np.ndarray, tol: float = 0.1, dataset: str = "cata"
) -> dict:
    """Per-molecule stability dict (reference analyze/analyze.py:50-100).

    positions [N, 3] (N includes orientation nodes in hetro mode),
    ring_types [N] int or [N, K] one-hot.
    """
    positions = np.asarray(positions, np.float64)
    if ring_types.ndim == 2:
        ring_types = ring_types.argmax(1)
    ring_types = np.asarray(ring_types, np.int64)
    results = {
        "orientation_nodes": True,
        "dist_stable": False,
        "connected": False,
        "angels3": False,
        "angels4": False,
    }
    if dataset == "hetro":
        n_rings = positions.shape[0] // 2
        positions = positions[:n_rings]
        orientation_class = len(RINGS_LIST["hetro"]) - 1
        tail = set(ring_types[n_rings:].tolist())
        if tail != {orientation_class} or orientation_class in ring_types[:n_rings]:
            results["orientation_nodes"] = False
            return results
        ring_types = ring_types[:n_rings]

    n = positions.shape[0]
    dist, adj = positions2adj(positions[None], ring_types[None], tol, dataset)
    dist, adj = dist[0], adj[0]
    _, _, min_dist = _distance_window_matrices(dataset)
    off_diag = ~np.eye(n, dtype=bool)
    if ((dist < min_dist * (1 - tol)) & off_diag).any():
        return results
    results["dist_stable"] = True

    g = nx.from_numpy_array(adj)
    if not nx.is_connected(g):
        return results
    results["connected"] = True

    a3, a4 = find_triplets_quads(adj, positions, ring_types, dataset)
    results["angels3"] = check_angels3(a3, tol, dataset)
    results["angels4"] = check_angels4(a4, tol, dataset)
    return results


def analyze_validity_for_molecules(molecule_list, tol=0.1, dataset="cata"):
    """Aggregate stability fractions (reference analyze/analyze.py:139-177).

    molecule_list: [(positions [N,3], ring_types [N] or [N,K]) ...]
    """
    n_samples = len(molecule_list)
    stable_list, stable_bool = [], []
    counters = dict.fromkeys(
        ["mol", "dist", "connected", "angels3", "angels4", "orientation"], 0
    )
    for x, t in molecule_list:
        r = check_stability(x, t, tol=tol, dataset=dataset)
        ok = all(r.values())
        counters["mol"] += ok
        counters["dist"] += r["dist_stable"]
        counters["connected"] += r["connected"]
        counters["angels3"] += r["angels3"]
        counters["angels4"] += r["angels4"]
        counters["orientation"] += r["orientation_nodes"]
        stable_bool.append(ok)
        if ok:
            stable_list.append((x, t))
    f = float(max(n_samples, 1))
    validity_dict = {
        "mol_stable": counters["mol"] / f,
        "orientation_nodes": counters["orientation"] / f,
        "dist_stable": counters["dist"] / f,
        "connected": counters["connected"] / f,
        "angels3": counters["angels3"] / f,
        "angels4": counters["angels4"] / f,
        "molecule_stable_bool": stable_bool,
    }
    return validity_dict, stable_list
