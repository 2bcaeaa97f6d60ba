"""Sampling priors: node-count categorical + per-node-count property histograms.

Rebuild of reference models_edm.py:21-58 (DistributionRings) and :107-192
(DistributionProperty) on numpy, with explicit np.random.Generator state
instead of torch Categorical objects.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# Reference-analyzed ring-count histograms (utils/helpers.py:64-96).
ANALYZED_RINGS = {
    "cata": {
        11: 20559, 10: 5164, 9: 1349, 8: 363, 7: 108, 5: 11,
        6: 32, 3: 2, 4: 3, 1: 1, 2: 1,
    },
    "hetro": {
        10: 56617, 9: 111471, 8: 107610, 7: 66431, 5: 8622,
        6: 28604, 4: 1829, 3: 329, 2: 51,
    },
}
ANALYZED_RINGS["peri"] = ANALYZED_RINGS["cata"]


class NodesDistribution:
    """Categorical over ring counts (reference DistributionRings)."""

    def __init__(self, histogram: Optional[dict] = None, dataset: str = "cata"):
        histogram = histogram or ANALYZED_RINGS[dataset]
        self.n_nodes = np.array(list(histogram.keys()), np.int64)
        prob = np.array(list(histogram.values()), np.float64)
        self.prob = prob / prob.sum()
        self._keys = {int(n): i for i, n in enumerate(self.n_nodes)}

    @classmethod
    def from_dataset(cls, dataset) -> "NodesDistribution":
        # StatsOnlyDataset (artifact restore without data files) carries the
        # recorded train-split histogram instead of raw examples
        hist = getattr(dataset, "nodes_hist", None)
        if hist is not None:
            return cls(histogram=hist)
        counts = np.bincount(dataset.data["n_nodes"])
        hist = {i: int(c) for i, c in enumerate(counts) if c > 0}
        return cls(histogram=hist)

    def sample(self, n_samples: int, rng: np.random.Generator) -> np.ndarray:
        idx = rng.choice(len(self.prob), size=n_samples, p=self.prob)
        return self.n_nodes[idx]

    def log_prob(self, batch_n_nodes: np.ndarray) -> np.ndarray:
        idx = np.array([self._keys[int(n)] for n in batch_n_nodes])
        return np.log(self.prob + 1e-30)[idx]


class PropertyDistribution:
    """Per-node-count histograms of (normalized) target values.

    Mirrors reference DistributionProperty (models_edm.py:107-192): 1000
    bins per (property, n_nodes); sampling draws a bin then a uniform value
    inside it.
    """

    def __init__(self, dataset, num_bins: int = 1000):
        # StatsOnlyDataset: rebuild from the artifact-recorded histograms
        # rather than a dataframe the machine no longer has
        state = getattr(dataset, "prop_dist_state", None)
        if state is not None:
            self._init_from_state(state)
            return
        self.num_bins = num_bins
        self.mean = dataset.mean
        self.std = dataset.std
        self.properties = dataset.cfg.targets
        self.distributions = {}

        nodes_arr = dataset.df["n_rings"].values
        for i, prop in enumerate(self.properties):
            data = dataset.df[prop].values.astype(np.float64)
            if dataset.cfg.normalize:
                data = (data - self.mean[i]) / self.std[i]
            per_prop = {}
            for n in range(int(nodes_arr.min()), int(nodes_arr.max()) + 1):
                vals = data[nodes_arr == n]
                if len(vals) == 0:
                    continue
                lo, hi = vals.min(), vals.max()
                rng_width = hi - lo + 1e-12
                bins = np.minimum(
                    ((vals - lo) / rng_width * num_bins).astype(np.int64),
                    num_bins - 1,
                )
                hist = np.bincount(bins, minlength=num_bins).astype(np.float64)
                per_prop[n] = {"probs": hist / hist.sum(), "params": (lo, hi)}
            self.distributions[prop] = per_prop

    def _init_from_state(self, state: dict) -> None:
        self.num_bins = int(state["num_bins"])
        self.properties = list(state["properties"])
        self.mean = state["mean"]
        self.std = state["std"]
        self.distributions = {
            p: {
                int(n): {
                    "probs": np.asarray(d["probs"], np.float64),
                    "params": (float(d["params"][0]), float(d["params"][1])),
                }
                for n, d in state["hists"][p].items()
            }
            for p in self.properties
        }

    def state(self) -> dict:
        """Serializable snapshot (inverse of from_state) — what artifacts
        record so guided generation works without the training CSV."""
        return {
            "num_bins": self.num_bins,
            "properties": list(self.properties),
            "mean": self.mean,
            "std": self.std,
            "hists": {
                p: {
                    int(n): {
                        "probs": d["probs"],
                        "params": d["params"],
                    }
                    for n, d in per.items()
                }
                for p, per in self.distributions.items()
            },
        }

    @classmethod
    def from_state(cls, state: dict) -> "PropertyDistribution":
        obj = cls.__new__(cls)
        obj._init_from_state(state)
        return obj

    def sample(self, n_nodes: int, rng: np.random.Generator) -> np.ndarray:
        vals = []
        for prop in self.properties:
            dist = self.distributions[prop][int(n_nodes)]
            idx = rng.choice(self.num_bins, p=dist["probs"])
            lo, hi = dist["params"]
            width = (hi - lo) / self.num_bins
            left = lo + idx * width
            vals.append(left + rng.random() * width)
        return np.array(vals, np.float32)

    def sample_batch(self, nodesxsample: np.ndarray, rng: np.random.Generator):
        return np.stack([self.sample(int(n), rng) for n in nodesxsample])

    def sample_df(self, nodesxsample: np.ndarray, df, rng: np.random.Generator):
        """Sample *real* normalized target rows conditioned on ring count
        (reference DistributionProperty.sample_df, models_edm.py:170-177)."""
        vals = []
        for n in nodesxsample:
            rows = df[df.n_rings == int(n)]
            pick = rows.iloc[rng.integers(len(rows))]
            vals.append([pick[p] for p in self.properties])
        return self.normalize(np.asarray(vals, np.float32))

    def normalize(self, val: np.ndarray) -> np.ndarray:
        return (val - self.mean) / self.std

    def unnormalize(self, val: np.ndarray) -> np.ndarray:
        return val * self.std + self.mean


class EmpiricalPropertyDistribution:
    """Samples real (normalized) target rows from a dataset's dataframe.

    Mirrors reference EmpiricalDistributionProperty (models_edm.py:195-218):
    instead of histogram resampling, draws actual property vectors from the
    data — useful when targets are strongly correlated.
    """

    def __init__(self, dataset):
        self.mean = dataset.mean
        self.std = dataset.std
        self.properties = dataset.cfg.targets
        self.data = dataset.df[self.properties].values.astype(np.float32)
        self._normalize = dataset.cfg.normalize

    def sample_batch(self, n: int, rng: np.random.Generator) -> np.ndarray:
        rows = self.data[rng.permutation(self.data.shape[0])[:n]]
        return self.normalize(rows) if self._normalize else rows

    def normalize(self, val: np.ndarray) -> np.ndarray:
        return (val - self.mean) / self.std

    def unnormalize(self, val: np.ndarray) -> np.ndarray:
        return val * self.std + self.mean
