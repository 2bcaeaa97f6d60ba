"""Native (C++) host-eval backend, loaded through ctypes.

The reference's chemistry validity path runs on RDKit — a native C++
library — via vendored xyz2mol (reference data/gor2goa.py:298-324,
data/xyz2mol.py:538-679). This package is gaudi_tpu's native tier for the
same role: connectivity / valence / Kekulé-matching validity and
Weisfeiler-Lehman identity hashing implemented in C++ (chem_native.cpp)
and auto-built with g++ on first import.

Public surface:
    available() -> bool
    valence_valid(atom_types, bonds, dataset) -> bool
    molecule_identity(atom_types, bonds, dataset) -> str
    judge_batch(mol_list, dataset) -> (valid: list[bool], identity: list[str|None])

Set GAUDI_NATIVE=0 to force the pure-python fallback
(gaudi_tpu/eval_chem/valence.py implements identical semantics; the two are
property-tested against each other in tests/test_native_chem.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "chem_native.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(_SRC), "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libgaudichem.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    """Build the shared library atomically.

    Cold-cache first use can race across processes (forked eval-pool
    workers all find the lib missing and compile concurrently): each
    compiles to a unique temp file in the same directory and os.rename()s
    it into place — atomic on one filesystem — so a sibling's dlopen never
    sees a half-written .so.
    """
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = os.path.join(_BUILD_DIR, f".libgaudichem.{os.getpid()}.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        import sys

        print(f"[gaudi_tpu.native] build failed:\n{res.stderr}", file=sys.stderr)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False
    try:
        os.rename(tmp, _LIB_PATH)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return os.path.exists(_LIB_PATH)
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GAUDI_NATIVE", "1") == "0":
            return None
        stale = not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        )
        if stale and not _compile():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.gaudi_valence_valid.restype = ctypes.c_int
        lib.gaudi_valence_valid.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),   # atomic numbers
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gaudi_wl_hash.restype = None
        lib.gaudi_wl_hash.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.gaudi_gor2goa.restype = ctypes.c_int
        lib.gaudi_gor2goa.argtypes = [
            ctypes.c_int,                      # n_total
            ctypes.POINTER(ctypes.c_double),   # x [n,3]
            ctypes.POINTER(ctypes.c_double),   # xy [n,2] aligned frame
            ctypes.POINTER(ctypes.c_int32),    # types
            ctypes.c_int,                      # orientation_mode
            ctypes.c_int,                      # K
            ctypes.POINTER(ctypes.c_double),   # win_lo
            ctypes.POINTER(ctypes.c_double),   # win_hi
            ctypes.POINTER(ctypes.c_int32),    # tmpl_size
            ctypes.POINTER(ctypes.c_double),   # tmpl_xy
            ctypes.POINTER(ctypes.c_int32),    # slot_elem
            ctypes.POINTER(ctypes.c_uint8),    # no_orient
            ctypes.POINTER(ctypes.c_double),   # orient_offset
            ctypes.POINTER(ctypes.c_int32),    # h_slot
            ctypes.c_int32,                    # h_elem_idx
            ctypes.c_double,                   # tol
            ctypes.POINTER(ctypes.c_double),   # out_pos
            ctypes.POINTER(ctypes.c_int32),    # out_elem
            ctypes.POINTER(ctypes.c_int32),    # out_bonds
            ctypes.c_int,                      # cap
            ctypes.c_int,                      # capb
            ctypes.POINTER(ctypes.c_int32),    # out_n
        ]
        lib.gaudi_judge_batch.restype = None
        lib.gaudi_judge_batch.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),   # atomic numbers
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


_label_cache: dict = {}


def _label_u64(symbol: str, implicit_h: int) -> int:
    """Stable 64-bit label for an (element, implicit-H) class."""
    key = (symbol, implicit_h)
    v = _label_cache.get(key)
    if v is None:
        v = int.from_bytes(
            hashlib.blake2b(
                f"{symbol}H{implicit_h}".encode(), digest_size=8
            ).digest(),
            "little",
        )
        _label_cache[key] = v
    return v


_ATOMIC_NUM = {
    "H": 1, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9,
    "Si": 14, "P": 15, "S": 16, "Cl": 17, "Br": 35, "I": 53,
}


def _atom_arrays(atom_types, bonds, dataset: str):
    """Per-atom atomic-number / WL-init-label arrays.

    Initial WL labels encode element + implicit-H class (degree-2 carbons
    carry one implicit H — reference gor2goa.py:288-293), matching the
    python backend's node labels. Validity itself runs the full AC2BO
    criterion natively from the atomic numbers.
    """
    from gaudi_tpu.data.rings import ATOMS_LIST

    symbols = [ATOMS_LIST[dataset][int(t)] for t in atom_types]
    znum = np.array([_ATOMIC_NUM[s] for s in symbols], dtype=np.int32)
    deg = np.zeros(len(symbols), np.int64)
    for a, c in bonds:
        deg[int(a)] += 1
        deg[int(c)] += 1
    labels = np.array(
        [
            _label_u64(s, 1 if (s == "C" and deg[i] == 2) else 0)
            for i, s in enumerate(symbols)
        ],
        dtype=np.uint64,
    )
    return znum, labels


def _bond_array(bonds) -> np.ndarray:
    b = np.asarray(bonds, dtype=np.int32)
    if b.size == 0:
        return np.zeros((0, 2), np.int32)
    return np.ascontiguousarray(b.reshape(-1, 2))


def valence_valid(atom_types, bonds, dataset: str = "cata") -> bool:
    lib = _load()
    assert lib is not None, "native backend unavailable"
    if len(atom_types) == 0 or len(bonds) == 0:
        return False
    b = _bond_array(bonds)
    znum, _ = _atom_arrays(atom_types, b, dataset)
    if (b < 0).any() or (b >= len(znum)).any():
        return False
    return bool(
        lib.gaudi_valence_valid(
            len(znum),
            _ptr(znum, ctypes.c_int32),
            b.shape[0],
            _ptr(b, ctypes.c_int32),
        )
    )


def molecule_identity(
    atom_types, bonds, dataset: str = "cata", iterations: int = 4
) -> str:
    """Canonical WL identity (hex). Backend-stable, not InChI-comparable."""
    lib = _load()
    assert lib is not None, "native backend unavailable"
    b = _bond_array(bonds)
    _, labels = _atom_arrays(atom_types, b, dataset)
    out = np.zeros(2, np.uint64)
    lib.gaudi_wl_hash(
        len(labels),
        _ptr(labels, ctypes.c_uint64),
        b.shape[0],
        _ptr(b, ctypes.c_int32),
        iterations,
        _ptr(out, ctypes.c_uint64),
    )
    return f"wl:{int(out[0]):016x}{int(out[1]):016x}"


_H_SLOTS = {"Bl": [4], "Pl": [4], "DhDb": [2, 5]}
_gor_vocab_cache: dict = {}


def _gor2goa_vocab(dataset: str):
    """Flattened vocabulary arrays for the native gor2goa (cached)."""
    v = _gor_vocab_cache.get(dataset)
    if v is not None:
        return v
    from gaudi_tpu.data.rings import (
        ATOMS_LIST,
        NO_ORIENTATION_RINGS,
        RINGS_DICT,
        RINGS_LIST,
    )
    from gaudi_tpu.eval_chem.gor2goa import RING_TEMPLATES
    from gaudi_tpu.eval_chem.stability import _distance_window_matrices

    names = RINGS_LIST[dataset]
    atoms = ATOMS_LIST[dataset]
    k = len(names)
    lo, hi, _ = _distance_window_matrices(dataset)
    tmpl_size = np.zeros(k, np.int32)
    tmpl_xy = np.zeros((k, 6, 2), np.float64)
    slot_elem = np.full((k, 6), -1, np.int32)
    no_orient = np.zeros(k, np.uint8)
    offset = np.zeros(k, np.float64)
    h_slot = np.full((k, 2), -1, np.int32)
    for i, nm in enumerate(names):
        t = RING_TEMPLATES.get(nm)
        if t is None:
            continue  # e.g. the '.' orientation pseudo-class: no template
        tmpl_size[i] = len(t)
        tmpl_xy[i, : len(t)] = t
        slot_elem[i, : len(t)] = [atoms.index(e) for e in RINGS_DICT[nm]]
        no_orient[i] = nm in NO_ORIENTATION_RINGS
        offset[i] = np.pi / 6 if nm == "Bn" else np.pi / 4
        for j, s in enumerate(_H_SLOTS.get(nm, [])):
            h_slot[i, j] = s
    v = {
        "K": k,
        "lo": np.ascontiguousarray(lo, np.float64),
        "hi": np.ascontiguousarray(hi, np.float64),
        "tmpl_size": tmpl_size,
        "tmpl_xy": np.ascontiguousarray(tmpl_xy),
        "slot_elem": np.ascontiguousarray(slot_elem),
        "no_orient": no_orient,
        "offset": offset,
        "h_slot": np.ascontiguousarray(h_slot),
        "h_idx": atoms.index("H"),
    }
    _gor_vocab_cache[dataset] = v
    return v


def gor2goa(x, ring_types, dataset: str = "cata", tol: float = 0.1):
    """Native GOR->GOA expansion. Same contract as eval_chem.gor2goa:
    (positions [M,2], atom_type_indices, bonds list). Raises ValueError on
    unexpandable inputs (matching the python path's exceptions)."""
    lib = _load()
    assert lib is not None, "native backend unavailable"
    from gaudi_tpu.data.mol import align_to_xy_plane

    v = _gor2goa_vocab(dataset)
    x = np.ascontiguousarray(np.asarray(x, np.float64))
    types = np.ascontiguousarray(np.asarray(ring_types, np.int64), np.int32)
    n_total = x.shape[0]
    # alignment stays in numpy: the frame (incl. its reflection) must be
    # bit-identical to the python path — template placement is chiral
    xy = np.ascontiguousarray(align_to_xy_plane(x)[:, :2], np.float64)
    cap, capb = 16 + 8 * max(n_total, 1), 32 + 16 * max(n_total, 1)
    out_pos = np.zeros((cap, 2), np.float64)
    out_elem = np.zeros(cap, np.int32)
    out_bonds = np.zeros((capb, 2), np.int32)
    out_n = np.zeros(2, np.int32)
    rc = lib.gaudi_gor2goa(
        n_total,
        _ptr(x, ctypes.c_double),
        _ptr(xy, ctypes.c_double),
        _ptr(types, ctypes.c_int32),
        1 if dataset == "hetro" else 0,
        v["K"],
        _ptr(v["lo"], ctypes.c_double),
        _ptr(v["hi"], ctypes.c_double),
        _ptr(v["tmpl_size"], ctypes.c_int32),
        _ptr(v["tmpl_xy"], ctypes.c_double),
        _ptr(v["slot_elem"], ctypes.c_int32),
        _ptr(v["no_orient"], ctypes.c_uint8),
        _ptr(v["offset"], ctypes.c_double),
        _ptr(v["h_slot"], ctypes.c_int32),
        np.int32(v["h_idx"]),
        float(tol),
        _ptr(out_pos, ctypes.c_double),
        _ptr(out_elem, ctypes.c_int32),
        _ptr(out_bonds, ctypes.c_int32),
        cap,
        capb,
        _ptr(out_n, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError(f"gor2goa native failed (rc={rc})")
    m, nb = int(out_n[0]), int(out_n[1])
    bonds = [list(map(int, out_bonds[e])) for e in range(nb)]
    return out_pos[:m].copy(), out_elem[:m].astype(np.int64), bonds


def judge_batch(mol_list, dataset: str = "cata", iterations: int = 4):
    """Validity + identity for [(atom_types, bonds)] in one native call.

    Returns (valid: list[bool], identity: list[str|None]); identity is None
    for invalid molecules. Molecules with no atoms or no bonds are invalid
    (matches the python backend).
    """
    lib = _load()
    assert lib is not None, "native backend unavailable"
    n = len(mol_list)
    atoms_off = np.zeros(n + 1, np.int64)
    bonds_off = np.zeros(n + 1, np.int64)
    znums, labels, bond_rows = [], [], []
    degenerate = np.zeros(n, bool)
    for i, (atom_types, bonds) in enumerate(mol_list):
        b = _bond_array(bonds)
        if len(atom_types) == 0 or b.shape[0] == 0 or (b < 0).any() or (
            b >= len(atom_types)
        ).any():
            degenerate[i] = True
            atoms_off[i + 1] = atoms_off[i]
            bonds_off[i + 1] = bonds_off[i]
            continue
        zn, lb = _atom_arrays(atom_types, b, dataset)
        znums.append(zn)
        labels.append(lb)
        bond_rows.append(b)
        atoms_off[i + 1] = atoms_off[i] + len(zn)
        bonds_off[i + 1] = bonds_off[i] + b.shape[0]

    znum = np.concatenate(znums) if znums else np.zeros(0, np.int32)
    lab = np.concatenate(labels) if labels else np.zeros(0, np.uint64)
    bnd = (
        np.concatenate(bond_rows)
        if bond_rows
        else np.zeros((0, 2), np.int32)
    )
    valid = np.zeros(n, np.uint8)
    hashes = np.zeros(2 * n, np.uint64)
    lib.gaudi_judge_batch(
        n,
        _ptr(atoms_off, ctypes.c_int64),
        _ptr(bonds_off, ctypes.c_int64),
        _ptr(znum, ctypes.c_int32),
        _ptr(lab, ctypes.c_uint64),
        _ptr(bnd, ctypes.c_int32),
        iterations,
        _ptr(valid, ctypes.c_uint8),
        _ptr(hashes, ctypes.c_uint64),
    )
    valid_l, ident_l = [], []
    for i in range(n):
        ok = bool(valid[i]) and not degenerate[i]
        valid_l.append(ok)
        ident_l.append(
            f"wl:{int(hashes[2*i]):016x}{int(hashes[2*i+1]):016x}" if ok else None
        )
    return valid_l, ident_l
