"""Visualization smoke tests: files get produced, bad input degrades cleanly."""

import os

import numpy as np

from gaudi_tpu.data.synthetic import RING_SPACING
from gaudi_tpu.utils.plotting import (
    plot_chain,
    plot_graph_of_rings,
    plot_graph_of_rings_3d,
    plot_molecule_atoms,
)


def _chain_positions(n):
    x = np.zeros((n, 3))
    x[:, 0] = np.arange(n) * RING_SPACING
    return x


class TestPlotting:
    def test_ring_graph_2d(self, tmp_path):
        p = str(tmp_path / "g.png")
        plot_graph_of_rings(_chain_positions(4), np.zeros(4, int), p, "cata")
        assert os.path.exists(p) and os.path.getsize(p) > 0

    def test_ring_graph_3d(self, tmp_path):
        p = str(tmp_path / "g3d.png")
        plot_graph_of_rings_3d(_chain_positions(3), np.zeros(3, int), p, "cata")
        assert os.path.exists(p) and os.path.getsize(p) > 0

    def test_chain_gif(self, tmp_path):
        frames = np.random.default_rng(0).normal(size=(3, 4, 4)).astype(np.float32)
        frames[..., :3] = _chain_positions(4)[None]
        p = str(tmp_path / "chain.gif")
        plot_chain(frames, p, "cata", fps=2)
        assert os.path.exists(p) and os.path.getsize(p) > 0

    def test_atom_plot(self, tmp_path):
        from gaudi_tpu.eval_chem import gor2goa

        pos, types, bonds = gor2goa(_chain_positions(2), np.zeros(2, int), "cata")
        p = str(tmp_path / "atoms.png")
        plot_molecule_atoms(pos, types, bonds, p, "cata", title="naphthalene")
        assert os.path.exists(p) and os.path.getsize(p) > 0

    def test_hetro_with_orientation_rows(self, tmp_path):
        # doubled layout should plot only the ring half
        x = np.concatenate([_chain_positions(3), _chain_positions(3) + 0.5])
        t = np.array([0, 5, 6, 11, 11, 11])
        p = str(tmp_path / "h.png")
        plot_graph_of_rings(x, t, p, "hetro")
        assert os.path.exists(p)
