"""Dense padded dataset + batch feed (the reference's AromaticDataset, array-first).

Key TPU-first changes vs reference data/aromatic_dataloader.py:45-335:

- **One-shot vectorized preprocessing with a consolidated .npz cache** instead
  of per-item torch.load files + 32 DataLoader workers: every molecule is
  converted to fixed-shape arrays once; epochs are pure numpy slicing
  (zero per-item Python in steady state).
- **Static shapes everywhere**: [M, Nmax, ...] padded arrays. Orientation
  ('hetro') mode stores *all* orientation candidates padded to a static axis
  and samples one per epoch on the host — reproducing the reference's
  per-__getitem__ random orientation pick (aromatic_dataloader.py:189) without
  per-item Python.
- **Edge masks are not stored or shipped**: they are a deterministic function
  of node counts, rebuilt on device by gaudi_tpu.core.masked.build_masks. The
  host->device transfer per batch is x, h, node_mask, y only.

Split semantics match the reference exactly (get_splits,
aromatic_dataloader.py:274-294): test = df.sample(frac=0.1, rs=42), then
val = remainder.sample(frac=0.1, rs=42), train = rest; target mean/std are
computed from the *unfiltered* train dataframe (aromatic_dataloader.py:71-84).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import Optional

import numpy as np
import pandas as pd

from gaudi_tpu.data.mol import load_xyz
from gaudi_tpu.data.rings import RINGS_LIST, extract_ring_graph

MAX_ORIENT = 4  # max orientation candidates per ring (>=2 hetero atoms rare)


@dataclasses.dataclass
class DatasetConfig:
    """Mirrors the data-relevant args of Args_EDM / PredictionArgs."""

    dataset: str = "cata"  # cata | peri | hetro
    csv_file: str = ""
    xyz_root: str = ""
    max_nodes: int = 11
    target_features: str = "GAP_eV"  # comma-separated
    normalize: bool = True
    sample_rate: float = 1.0
    cache_dir: str = ""  # defaults to xyz_root + "_tpu_cache"

    @property
    def targets(self) -> list:
        return [t for t in self.target_features.split(",") if t] if self.target_features else []

    @property
    def orientation(self) -> bool:
        # Deliberate deviation from the reference (which flags every
        # non-cata dataset as orientation mode, aromatic_dataloader.py:64):
        # peri rings are all Bn with no orientation handle, and the
        # reference's peri eval path is internally inconsistent (its
        # orientation-node check indexes the hetro vocabulary,
        # analyze/analyze.py:69). Orientation mode is hetro-only here.
        return self.dataset == "hetro"


def get_splits(cfg: DatasetConfig, random_seed=42, val_frac=0.1, test_frac=0.1):
    """80/10/10 split with the reference's exact sampling order."""
    df = pd.read_csv(cfg.csv_file)
    if "nRings" in df.columns:
        df = df.rename(columns={"nRings": "n_rings", "name": "molecule"})
    df_all = df.copy()
    df_test = df.sample(frac=test_frac, random_state=random_seed)
    df = df.drop(df_test.index)
    df_val = df.sample(frac=val_frac, random_state=random_seed)
    df_train = df.drop(df_val.index)
    return df_train, df_val, df_test, df_all


def _extract_one(task):
    """Worker: one molecule -> (centers, types, orientations) or None."""
    path, dataset, n_max = task
    try:
        rg = extract_ring_graph(load_xyz(path), dataset)
    except (ValueError, FileNotFoundError):
        return None
    if rg.n_rings > n_max or rg.n_rings == 0:
        return None
    return rg.centers, rg.ring_types, rg.orientations


def _preprocess_split(
    cfg: DatasetConfig, df: pd.DataFrame, cache_path: str, n_workers: int = 0
) -> dict:
    """Ring-extract every molecule of a split into consolidated arrays.

    At COMPAS/PASs scale (27k-380k molecules) the per-molecule cycle-basis
    extraction dominates; a process pool parallelizes it (the reference used
    32 torch DataLoader workers per epoch instead — here preprocessing runs
    exactly once, then epochs are pure array slicing).
    """
    rows = df.reset_index(drop=True)
    data = None
    if os.path.exists(cache_path):
        with np.load(cache_path) as z:
            data = {k: z[k] for k in z.files}

    if data is None:
        names = RINGS_LIST[cfg.dataset]
        k = len(names)
        n_max = cfg.max_nodes
        m = len(rows)

        x = np.zeros((m, n_max, 3), np.float32)
        types = np.zeros((m, n_max), np.int32)
        n_nodes = np.zeros((m,), np.int32)
        orient = np.zeros((m, n_max, MAX_ORIENT, 3), np.float32)
        orient_count = np.zeros((m, n_max), np.int32)
        keep = np.ones((m,), bool)

        tasks = [
            (os.path.join(cfg.xyz_root, str(rows.loc[i]["molecule"]) + ".xyz"),
             cfg.dataset, n_max)
            for i in range(m)
        ]
        n_workers = n_workers or (os.cpu_count() if m > 2000 else 0)
        if n_workers and n_workers > 1:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            # spawn, not fork: the parent may hold JAX's thread pool
            with ProcessPoolExecutor(
                max_workers=n_workers, mp_context=mp.get_context("spawn")
            ) as pool:
                results = list(pool.map(_extract_one, tasks, chunksize=256))
        else:
            results = [_extract_one(t) for t in tasks]

        for i, res in enumerate(results):
            if res is None:
                keep[i] = False
                continue
            centers, ring_types, orientations = res
            r = centers.shape[0]
            x[i, :r] = centers
            types[i, :r] = ring_types
            n_nodes[i] = r
            for j, o in enumerate(orientations):
                c = min(o.shape[0], MAX_ORIENT)
                orient[i, j, :c] = o[:c]
                orient_count[i, j] = c

        data = {
            "x": x[keep],
            "types": types[keep],
            "n_nodes": n_nodes[keep],
            "orient": orient[keep],
            "orient_count": orient_count[keep],
            "keep": keep,
            "n_classes": np.array(k),
        }
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        np.savez_compressed(cache_path, **data)

    # Targets come straight from the CSV dataframe at load time, so the
    # expensive geometry cache is target-independent: the EDM (e.g. 2
    # targets) and the predictor (5 targets) share one preprocessing pass.
    keep = data.pop("keep")
    kept_rows = rows.loc[np.nonzero(keep)[0]]
    y = np.zeros((int(keep.sum()), max(len(cfg.targets), 1)), np.float32)
    if cfg.targets:
        y[:] = kept_rows[list(cfg.targets)].to_numpy(np.float32)
    data["y"] = y
    return data


class AromaticDataset:
    """One split of padded dense ring graphs, numpy-resident.

    Batch layout (matching the model conventions):
      x          [B, N', 3]   CoM-uncentered ring coordinates
      node_mask  [B, N', 1]
      edge_mask  [B, N', N']
      h          [B, N', K]   one-hot ring types (+orientation class in hetro)
      y          [B, T]       (normalized when cfg.normalize)
    with N' = max_nodes (cata) or 2*max_nodes (hetro orientation mode).
    """

    def __init__(
        self,
        cfg: DatasetConfig,
        df: pd.DataFrame,
        mean: Optional[np.ndarray] = None,
        std: Optional[np.ndarray] = None,
        task: str = "train",
    ):
        self.cfg = cfg
        self.task = task
        df = df[df.n_rings <= cfg.max_nodes].reset_index(drop=True)
        self.df = df

        cache_dir = cfg.cache_dir or (cfg.xyz_root.rstrip("/") + "_tpu_cache")
        # v2: geometry-only signature — target features are applied at load
        # time from the CSV, so predictor/EDM target sets share one cache
        sig = hashlib.md5(
            f"v2|{cfg.csv_file}|{cfg.dataset}|{cfg.max_nodes}|"
            f"{len(df)}|{task}".encode()
        ).hexdigest()[:12]
        self.data = _preprocess_split(
            cfg, df, os.path.join(cache_dir, f"{task}_{sig}.npz")
        )
        # identity cache for novelty eval (bump the suffix when the
        # chemistry judge changes semantics; ids2 = row-aligned, "" for
        # judge-invalid rows — ids1 was valid-compacted and misaligned
        # against per-row data on splits with any invalid rows)
        self._ids_path = os.path.join(cache_dir, f"{task}_{sig}_ids2.npz")

        t = max(len(cfg.targets), 1)
        if cfg.normalize and mean is not None:
            self.mean, self.std = mean, std
        else:
            self.mean = np.zeros(t, np.float32)
            self.std = np.ones(t, np.float32)

        m = self.data["x"].shape[0]
        self.examples = np.arange(m)
        if cfg.sample_rate < 1:
            n_keep = round(m * cfg.sample_rate)
            self.examples = np.random.default_rng(0).permutation(m)[:n_keep]

        self.n_classes = int(self.data["n_classes"])
        self.num_node_features = self.n_classes
        self.num_targets = t

    def __len__(self) -> int:
        return len(self.examples)

    @property
    def padded_nodes(self) -> int:
        return self.cfg.max_nodes * (2 if self.cfg.orientation else 1)

    def rescale_loss(self, loss):
        """Normalized-unit loss -> original units (dataloader.py:109-113)."""
        return loss * float(self.std.mean()) if self.cfg.normalize else loss

    def chem_identities(self, n_workers: int = 0) -> list:
        """Identity strings (InChI/WL) of this split's molecules, disk-cached.

        Row-aligned with `self.data`: entry i is "" when row i judges
        invalid, so identities can be paired with n_nodes/targets.

        Novelty eval needs the training set's identities on every
        invocation; recomputing them pushes the whole split through
        GOR->GOA + judging (~30 s for 27k molecules on one core), so the
        result persists next to the geometry cache.
        """
        if os.path.exists(self._ids_path):
            with np.load(self._ids_path) as z:
                return z["ids"].tolist()

        from gaudi_tpu.eval_chem import analyze_chemical_validity_for_molecules

        d = self.data
        n_cls = self.n_classes
        mols = []
        for i in range(d["x"].shape[0]):
            r = int(d["n_nodes"][i])
            if self.cfg.orientation:
                ori = d["orient"][i, :r, 0]
                xi = np.concatenate([d["x"][i, :r], ori])
                ti = np.concatenate(
                    [d["types"][i, :r], np.full(r, n_cls - 1, np.int64)]
                )
            else:
                xi, ti = d["x"][i, :r], d["types"][i, :r]
            mols.append((xi, ti))
        ids = analyze_chemical_validity_for_molecules(
            mols, dataset=self.cfg.dataset, n_workers=n_workers
        )["identity_by_row"]
        # row-aligned: one entry per split row, "" where the judge said
        # invalid, so callers can pair identities with n_nodes/targets
        ids = ["" if s is None else s for s in ids]
        arr = np.array(ids, dtype=np.str_)
        try:
            np.savez_compressed(self._ids_path, ids=arr)
        except OSError:
            pass
        return list(ids)

    def collate(self, idx: np.ndarray, rng: Optional[np.random.Generator] = None):
        """Assemble a batch dict for the given example rows (vectorized)."""
        d = self.data
        n_max = self.cfg.max_nodes
        k = self.n_classes
        x = d["x"][idx]
        types = d["types"][idx]
        n = d["n_nodes"][idx]
        b = len(idx)

        node_mask = (np.arange(n_max)[None, :] < n[:, None]).astype(np.float32)
        h = np.eye(k, dtype=np.float32)[types] * node_mask[..., None]

        y = d["y"][idx]
        if self.cfg.normalize and self.cfg.targets:
            y = (y - self.mean) / self.std

        if self.cfg.orientation:
            rng = rng or np.random.default_rng(0)
            cnt = d["orient_count"][idx]  # [B, N]
            pick = (rng.random(cnt.shape) * np.maximum(cnt, 1)).astype(np.int64)
            ox = np.take_along_axis(
                d["orient"][idx], pick[..., None, None], axis=2
            )[:, :, 0]  # [B, N, 3]
            x_full = np.concatenate([x, ox * node_mask[..., None]], axis=1)
            node_mask_full = np.concatenate([node_mask, node_mask], axis=1)
            h_full = np.zeros((b, 2 * n_max, k), np.float32)
            h_full[:, :n_max] = h
            # orientation pseudo-nodes carry the last ring-type class
            h_full[:, n_max:, -1] = node_mask
            return {
                "x": x_full,
                "h": h_full,
                "node_mask": node_mask_full[..., None],
                "n_nodes": n,
                "y": y,
            }
        return {
            "x": x,
            "h": h,
            "node_mask": node_mask[..., None],
            "n_nodes": n,
            "y": y,
        }

    def plane_rms(self) -> np.ndarray:
        """Per-example RMS distance of the ring centers from their best-fit
        plane (Å), computed once and cached. The smallest singular value of
        the centered coordinates equals sqrt(sum of squared plane
        residuals); dividing by sqrt(n) gives the RMS. Used as the molecule
        'geometric difficulty' signal for planarity-weighted sampling
        (config.py planar_boost)."""
        if getattr(self, "_plane_rms", None) is None:
            x, n = self.data["x"], self.data["n_nodes"]
            out = np.zeros(x.shape[0], np.float32)
            for i in range(x.shape[0]):
                p = x[i, : n[i]].astype(np.float64)
                p = p - p.mean(0)
                s = np.linalg.svd(p, compute_uv=False)
                out[i] = s[-1] / np.sqrt(max(n[i], 1))
            self._plane_rms = out
        return self._plane_rms

    def sampling_probs(self, boost: float, tau: float) -> Optional[np.ndarray]:
        """Mixture of uniform and ease-weighted sampling probabilities over
        self.examples (see config.py planar_boost). None when boost == 0."""
        if boost <= 0.0:
            return None
        rms = self.plane_rms()[self.examples]
        w = np.exp(-(rms - rms.min()) / max(tau, 1e-6))
        w = w / w.sum()
        u = np.full(len(w), 1.0 / len(w))
        p = (1.0 - boost) * u + boost * w
        return p / p.sum()

    def iter_batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        rng: Optional[np.random.Generator] = None,
        drop_last: bool = False,
        probs: Optional[np.ndarray] = None,
    ):
        """Yield batch dicts; final partial batch is padded by repetition to
        keep shapes static (mask-correct: repeated examples are real data,
        callers average with the `weight` entry). With `probs` (aligned to
        self.examples) the epoch draws len(self) examples with replacement
        from that distribution instead of shuffling a permutation."""
        rng = rng or np.random.default_rng(0)
        if probs is not None:
            order = rng.choice(self.examples, size=len(self.examples),
                               replace=True, p=probs)
        else:
            order = self.examples.copy()
            if shuffle:
                rng.shuffle(order)
        m = len(order)
        for s in range(0, m, batch_size):
            idx = order[s : s + batch_size]
            weight = np.ones(batch_size, np.float32)
            if len(idx) < batch_size:
                if drop_last:
                    return
                pad = batch_size - len(idx)
                weight[len(idx) :] = 0.0
                filler = np.tile(order, pad // len(order) + 1)[:pad]
                idx = np.concatenate([idx, filler])
            batch = self.collate(idx, rng)
            batch["weight"] = weight
            yield batch


class StatsOnlyDataset:
    """Dataset stand-in rebuilt from artifact-recorded train-split stats
    (utils/artifacts.py collect_dataset_stats) when the data files are gone.

    Carries everything the sampling/eval/guidance paths derive from the
    train split — normalization mean/std, node-count histogram, property
    histograms, input width — with the exact values the weights were
    trained against. Anything that needs real examples (training epochs,
    novelty identity sets) raises with a pointer at the missing CSV, rather
    than silently recomputing shifted statistics from regenerated data
    (the round-2 ADVICE.md finding)."""

    def __init__(self, cfg: DatasetConfig, stats: dict):
        self.cfg = cfg
        self.split = "stats-only"
        self.n_classes = int(stats["n_classes"])
        self.num_node_features = self.n_classes
        t = len(cfg.targets)
        self.num_targets = t
        if cfg.normalize and stats.get("mean") is not None:
            self.mean = np.asarray(stats["mean"], np.float32)
            self.std = np.asarray(stats["std"], np.float32)
        else:
            self.mean = np.zeros(t, np.float32)
            self.std = np.ones(t, np.float32)
        self.nodes_hist = dict(stats["nodes_hist"])
        self.prop_dist_state = stats.get("prop_dist")
        self._train_size = int(stats.get("meta", {}).get("train_size", 0))

    def __len__(self) -> int:
        return self._train_size

    @property
    def padded_nodes(self) -> int:
        return self.cfg.max_nodes * (2 if self.cfg.orientation else 1)

    def rescale_loss(self, loss):
        return loss * float(self.std.mean()) if self.cfg.normalize else loss

    def _need_data(self, what: str):
        raise RuntimeError(
            f"{what} needs the real dataset files, but this model was "
            f"restored from a stats-only artifact and csv_file="
            f"{self.cfg.csv_file!r} does not exist. Regenerate or point "
            "csv_file/xyz_root at the data to use this path."
        )

    def iter_batches(self, *a, **k):
        self._need_data("training/validation iteration")

    def collate(self, *a, **k):
        self._need_data("batch collation")

    def chem_identities(self, *a, **k):
        self._need_data("novelty reference identities")


def create_datasets(cfg: DatasetConfig):
    """(train, val, test) AromaticDatasets with shared train-split stats."""
    df_train, df_val, df_test, _ = get_splits(cfg)
    if cfg.normalize and cfg.targets:
        vals = df_train[cfg.targets].values
        mean = vals.mean(0).astype(np.float32)
        std = vals.std(0).astype(np.float32)
    else:
        mean = std = None
    return (
        AromaticDataset(cfg, df_train, mean, std, "train"),
        AromaticDataset(cfg, df_val, mean, std, "val"),
        AromaticDataset(cfg, df_test, mean, std, "test"),
    )


def resolve_datasets(cfg: DatasetConfig, restore: Optional[str] = None):
    """create_datasets, artifact-aware.

    When `restore` points at a stats-carrying artifact (weights.npz with
    recorded train-split statistics):
      - missing data files → StatsOnlyDataset triple (sampling/eval work,
        training raises informatively);
      - present data files → real datasets, but with the RECORDED
        normalization stats and priors overriding the recomputed ones, so
        conditioned sampling/eval can't silently shift when the data tree
        was regenerated with a different size/seed (warns on drift).
    Without stats this is exactly create_datasets."""
    import warnings

    stats = None
    if restore:
        from gaudi_tpu.utils.artifacts import load_artifact_stats

        stats = load_artifact_stats(restore)
    if stats is None:
        return create_datasets(cfg)
    if not (cfg.csv_file and os.path.exists(cfg.csv_file)):
        ds = StatsOnlyDataset(cfg, stats)
        return ds, ds, ds
    dsets = create_datasets(cfg)
    train = dsets[0]
    if int(stats["n_classes"]) != train.n_classes:
        raise ValueError(
            f"artifact was trained with n_classes={stats['n_classes']} but "
            f"the dataset at {cfg.csv_file} yields {train.n_classes}"
        )
    if cfg.normalize and stats.get("mean") is not None and cfg.targets:
        rec_m = np.asarray(stats["mean"], np.float32)
        rec_s = np.asarray(stats["std"], np.float32)
        if train.mean is not None and len(train.mean) == len(rec_m):
            drift = float(
                np.max(np.abs(train.mean - rec_m) / np.maximum(rec_s, 1e-6))
            )
            if drift > 0.05:
                warnings.warn(
                    f"dataset at {cfg.csv_file} has target stats drifting "
                    f"{drift:.2f}σ from the artifact's recorded ones "
                    "(regenerated with a different size/seed?); using the "
                    "recorded stats the weights were trained with"
                )
        for d in dsets:
            d.mean, d.std = rec_m.copy(), rec_s.copy()
    # recorded priors win over recomputed ones for the same reason
    train.nodes_hist = dict(stats["nodes_hist"])
    if stats.get("prop_dist") is not None:
        train.prop_dist_state = stats["prop_dist"]
    return dsets
