"""scripts/salvage_csv.py — rebuild an interrupted datagen run's csv.

generate_dataset streams accepted molecules to <dataset>-xyz/ and writes
the csv only at the end; the salvager reconstructs every column from the
geometry alone. These tests pin the reconstruction against the generator's
own ground truth (the completed csv), including the labeled VALID column
and the truncated-tail-file skip.
"""

import os
import subprocess
import sys

import pandas as pd
import pytest

from gaudi_tpu.data.synthetic import generate_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SALVAGE = os.path.join(REPO, "scripts", "salvage_csv.py")


def _run_salvage(root, dataset, labeled=False):
    cmd = [sys.executable, SALVAGE, "--root", str(root), "--dataset", dataset]
    if labeled:
        cmd.append("--labeled")
    return subprocess.run(cmd, capture_output=True, text=True, check=True)


@pytest.mark.parametrize(
    "dataset,labeled", [("cata", False), ("hetro", True)]
)
def test_salvage_matches_generator(tmp_path, dataset, labeled):
    csv = generate_dataset(
        str(tmp_path), dataset, n_molecules=12, seed=4, labeled=labeled
    )
    truth = pd.read_csv(csv)
    os.remove(csv)  # simulate the timeout kill: xyz tree survives, csv lost

    _run_salvage(tmp_path, dataset, labeled=labeled)
    got = pd.read_csv(csv)

    assert list(got["molecule"]) == sorted(truth["molecule"])
    truth_by = truth.set_index("molecule")
    got_by = got.set_index("molecule")
    assert (got_by["n_rings"] == truth_by.loc[got_by.index, "n_rings"]).all()
    if labeled:
        assert (got_by["VALID"] == truth_by.loc[got_by.index, "VALID"]).all()
    # Hueckel targets are geometry-deterministic modulo the redrawn 0.02 eV
    # measurement noise (Erel is pure noise and excluded)
    for col in ["HOMO_eV", "GAP_eV", "aIP_eV"]:
        dev = (got_by[col] - truth_by.loc[got_by.index, col]).abs().max()
        assert dev < 0.15, f"{col} deviates {dev}"


def test_salvage_skips_truncated_tail(tmp_path):
    csv = generate_dataset(str(tmp_path), "cata", n_molecules=6, seed=9)
    truth = pd.read_csv(csv)
    os.remove(csv)
    xyz_dir = tmp_path / "cata-xyz"
    victim = sorted(os.listdir(xyz_dir))[-1]
    full = (xyz_dir / victim).read_text()
    (xyz_dir / victim).write_text(full[: len(full) // 2])  # mid-write kill

    res = _run_salvage(tmp_path, "cata")
    got = pd.read_csv(csv)
    assert len(got) == len(truth) - 1
    assert victim[:-4] not in set(got["molecule"])
    assert "skip" in res.stdout
