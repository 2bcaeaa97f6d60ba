"""Visualization: ring-graph plots and denoising-chain GIFs.

Compact rebuild of reference utils/plotting.py:53-358 on matplotlib/imageio
(both optional — every function degrades to a no-op with a warning when the
backend is missing, mirroring the reference's try/except-swallowed plotting
calls, sampling_edm.py:233-244).
"""

from __future__ import annotations

import os
import warnings

import numpy as np

from gaudi_tpu.data.rings import RINGS_LIST
from gaudi_tpu.eval_chem.stability import positions2adj

_RING_COLORS = {
    "Bn": "tab:gray", "Pl": "tab:blue", "Bl": "tab:orange", "Fu": "tab:red",
    "Th": "tab:olive", "Pd": "tab:cyan", "Pz": "tab:purple", "Bz": "tab:green",
    "DhDb": "tab:brown", "Db": "tab:pink", "Cbd": "black", ".": "lightgray",
}


def _mpl():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        warnings.warn("matplotlib unavailable; skipping plot")
        return None


def plot_graph_of_rings(
    x,
    ring_types,
    filename: str,
    dataset: str = "cata",
    title: str = "",
    tol: float = 0.1,
):
    """2-D ring-graph rendering (reference plot_graph_of_rings :148-216)."""
    plt = _mpl()
    if plt is None:
        return
    x = np.asarray(x)
    ring_types = np.asarray(ring_types)
    if ring_types.ndim == 2:
        ring_types = ring_types.argmax(-1)
    names = RINGS_LIST[dataset]
    n = x.shape[0] if dataset == "cata" else x.shape[0] // 2
    _, adj = positions2adj(x[None, :n], ring_types[None, :n], tol, dataset)
    adj = adj[0]

    fig, ax = plt.subplots(figsize=(4, 4))
    for i in range(n):
        for j in range(i + 1, n):
            if adj[i, j]:
                ax.plot(x[[i, j], 0], x[[i, j], 1], c="k", lw=1, zorder=1)
    for i in range(n):
        name = names[int(ring_types[i])]
        ax.scatter(
            x[i, 0], x[i, 1], s=400, zorder=2,
            c=_RING_COLORS.get(name, "tab:gray"), edgecolors="k",
        )
        ax.annotate(
            name, (x[i, 0], x[i, 1]), ha="center", va="center", zorder=3, fontsize=7
        )
    ax.set_aspect("equal")
    ax.axis("off")
    if title:
        ax.set_title(title, fontsize=8)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    fig.savefig(filename, bbox_inches="tight", dpi=120)
    plt.close(fig)


def plot_chain(
    chain,
    filename: str,
    dataset: str = "cata",
    fps: int = 10,
):
    """Denoising-trajectory GIF (reference plot_chain :320-358).

    chain: [F, N, 3+K] frames, noisiest first.
    """
    plt = _mpl()
    if plt is None:
        return
    try:
        import imageio.v2 as imageio
    except Exception:
        warnings.warn("imageio unavailable; skipping gif")
        return

    chain = np.asarray(chain)
    tmpdir = filename + "_frames"
    os.makedirs(tmpdir, exist_ok=True)
    paths = []
    for f in range(chain.shape[0]):
        x = chain[f, :, :3]
        t = chain[f, :, 3:].argmax(-1)
        p = os.path.join(tmpdir, f"{f:04d}.png")
        plot_graph_of_rings(x, t, p, dataset=dataset)
        paths.append(p)
    frames = [imageio.imread(p) for p in paths]
    # bbox_inches="tight" renders per-frame canvases that differ by a few
    # pixels; pad to a common size or mimsave's np.stack raises
    h = max(f.shape[0] for f in frames)
    w = max(f.shape[1] for f in frames)
    frames = [
        np.pad(
            f,
            ((0, h - f.shape[0]), (0, w - f.shape[1])) + ((0, 0),) * (f.ndim - 2),
            constant_values=255,
        )
        for f in frames
    ]
    imageio.mimsave(filename if filename.endswith(".gif") else filename + ".gif",
                    frames, duration=1000.0 / fps)
    for p in paths:
        os.remove(p)
    os.rmdir(tmpdir)


def plot_graph_of_rings_3d(
    x,
    ring_types,
    filename: str,
    dataset: str = "cata",
    title: str = "",
    tol: float = 0.1,
):
    """3-D ring-graph rendering (reference plot_graph_of_rings_3d :219-318)."""
    plt = _mpl()
    if plt is None:
        return
    x = np.asarray(x)
    ring_types = np.asarray(ring_types)
    if ring_types.ndim == 2:
        ring_types = ring_types.argmax(-1)
    names = RINGS_LIST[dataset]
    n = x.shape[0] if dataset == "cata" else x.shape[0] // 2
    _, adj = positions2adj(x[None, :n], ring_types[None, :n], tol, dataset)
    adj = adj[0]

    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    for i in range(n):
        for j in range(i + 1, n):
            if adj[i, j]:
                ax.plot(x[[i, j], 0], x[[i, j], 1], x[[i, j], 2], c="k", lw=1)
    for i in range(n):
        name = names[int(ring_types[i])]
        ax.scatter(
            x[i, 0], x[i, 1], x[i, 2], s=200,
            c=_RING_COLORS.get(name, "tab:gray"), edgecolors="k",
        )
    if title:
        ax.set_title(title, fontsize=8)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    fig.savefig(filename, bbox_inches="tight", dpi=120)
    plt.close(fig)


def plot_rdkit(positions, ring_type_idx, filename: str, dataset="cata",
               tol: float = 0.1, title: str = "", add_inchi: bool = False):
    """RDKit structure rendering of a generated ring graph.

    Reference `plot_rdkit` (utils/plotting.py:111-145, called from
    generation_guidance.py:159-179): GOR->GOA, InChI via the validity
    judge, Chem.MolFromInchi, Draw.MolToImage into a matplotlib axis.
    Returns True when the drawing landed; False when RDKit is absent, the
    molecule has no valid InChI, or matplotlib is unavailable — callers
    fall back to `plot_molecule_atoms` (the always-available atom-graph
    rendering).
    """
    from gaudi_tpu.eval_chem.valence import rdkit_chem, try_rdkit_inchi

    Chem = rdkit_chem()
    plt = _mpl()
    if Chem is None or plt is None:
        return False
    from gaudi_tpu.eval_chem.gor2goa import gor2goa

    try:
        _, atom_types, bonds = gor2goa(
            np.asarray(positions), np.asarray(ring_type_idx), dataset, tol
        )
    except Exception:
        return False
    inchi = try_rdkit_inchi(atom_types, bonds, dataset)
    if inchi is None:
        return False
    mol = Chem.MolFromInchi(inchi)
    if mol is None:
        return False
    try:
        from rdkit.Chem import Draw

        img = Draw.MolToImage(mol)
    except Exception:
        return False
    if add_inchi:
        title = (title + "\n" + inchi) if title else inchi
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(img)
    ax.set_title(title, fontsize=10)
    ax.set_xticks([])
    ax.set_yticks([])
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    fig.savefig(filename, bbox_inches="tight", pad_inches=0.0)
    plt.close(fig)
    return True


def plot_molecule_atoms(positions, atom_type_idx, bonds, filename: str, dataset="cata", title=""):
    """Atom-graph rendering of a GOR->GOA conversion (stand-in for the
    reference's RDKit drawing, utils/plotting.py:111-145, which needs RDKit)."""
    plt = _mpl()
    if plt is None:
        return
    from gaudi_tpu.data.rings import ATOMS_LIST

    positions = np.asarray(positions)
    fig, ax = plt.subplots(figsize=(4, 4))
    for a, b in bonds:
        ax.plot(positions[[a, b], 0], positions[[a, b], 1], c="k", lw=1, zorder=1)
    symbols = [ATOMS_LIST[dataset][int(t)] for t in atom_type_idx]
    for i, s in enumerate(symbols):
        if s == "C":
            continue
        ax.annotate(s, positions[i, :2], ha="center", va="center",
                    fontsize=9, color="tab:red", zorder=3)
    ax.set_aspect("equal")
    ax.axis("off")
    if title:
        ax.set_title(title, fontsize=8)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    fig.savefig(filename, bbox_inches="tight", dpi=120)
    plt.close(fig)
