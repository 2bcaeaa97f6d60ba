"""Convert reference PyTorch checkpoints to gaudi_tpu flax parameter trees.

Lets users of the original GaUDI (tomer196/GaUDI) carry their trained
`model.pt` state_dicts to this framework, and powers the golden parity tests
(tests/test_parity_torch.py) that verify our dense reformulation is
numerically identical to the reference's scatter-based EGNN.

Key mapping notes:
- torch Linear stores weight [out, in]; flax Dense stores kernel [in, out].
- Our split-weight edge input layer (gaudi_tpu.models.egnn.EdgeMLPIn) slices
  the reference's concat-weight row blocks: for edge-MLP input
  concat([h_i, h_j, e_ij]) @ W^T + b, rows W[:, :H] -> src kernel,
  W[:, H:2H] -> dst kernel, W[:, 2H:] -> edge kernel, b -> dst bias.
- Reference dynamics keys: `egnn.e_block_{i}.gcl_{k}.*`, `egnn.e_block_{i}.
  gcl_equiv.*` (edm/egnn/egnn_new.py:186-211, 276-296); predictor keys:
  `egnn.gcl_{i}.*` (edm/egnn_predictor/models.py:520-539, gcl.py:191-220).
- `nn.DataParallel` wrappers prefix keys with `module.`; stripped here.

Only numpy is required; tensors may be torch Tensors or numpy arrays.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def strip_data_parallel(sd: Mapping) -> dict:
    """Remove a torch `module.` DataParallel prefix if present."""
    if all(k.startswith("module.") for k in sd):
        return {k[len("module.") :]: v for k, v in sd.items()}
    return dict(sd)


def _dense(sd, prefix) -> dict:
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _split_edge_in(sd, prefix, hidden_nf) -> dict:
    """Split a concat-input Linear into src/dst/edge blocks (see module doc)."""
    w = _np(sd[prefix + ".weight"])  # [out, 2H + E]
    b = _np(sd[prefix + ".bias"])
    h = hidden_nf
    out = {
        "src": {"kernel": w[:, :h].T},
        "dst": {"kernel": w[:, h : 2 * h].T, "bias": b},
    }
    if w.shape[1] > 2 * h:  # edge-attr-free GCLs (gnn mode) have no edge block
        out["edge"] = {"kernel": w[:, 2 * h :].T}
    return out


def _gcl_params(sd, p, hidden_nf, attention) -> dict:
    out = {
        "edge_in": _split_edge_in(sd, f"{p}.edge_mlp.0", hidden_nf),
        "edge_out": _dense(sd, f"{p}.edge_mlp.2"),
        "node_in": _dense(sd, f"{p}.node_mlp.0"),
        "node_out": _dense(sd, f"{p}.node_mlp.2"),
    }
    if attention:
        out["att"] = _dense(sd, f"{p}.att_mlp.0")
    return out


def dynamics_params_from_torch(
    state_dict: Mapping, n_layers: int, inv_sublayers: int, hidden_nf: int,
    attention: bool = True,
) -> dict:
    """Reference EGNN_dynamics state_dict -> EGNNDynamics flax params."""
    sd = strip_data_parallel(state_dict)
    # Allow a full EnVariationalDiffusion state_dict (keys 'dynamics.*').
    if any(k.startswith("dynamics.") for k in sd):
        sd = {
            k[len("dynamics.") :]: v for k, v in sd.items() if k.startswith("dynamics.")
        }
    egnn = {
        "embedding": _dense(sd, "egnn.embedding"),
        "embedding_out": _dense(sd, "egnn.embedding_out"),
    }
    for i in range(n_layers):
        bp = f"egnn.e_block_{i}"
        block = {}
        for k in range(inv_sublayers):
            block[f"gcl_{k}"] = _gcl_params(sd, f"{bp}.gcl_{k}", hidden_nf, attention)
        block["equiv"] = {
            "coord_in": _split_edge_in(sd, f"{bp}.gcl_equiv.coord_mlp.0", hidden_nf),
            "coord_mid": _dense(sd, f"{bp}.gcl_equiv.coord_mlp.2"),
            "coord_gate": {"kernel": _np(sd[f"{bp}.gcl_equiv.coord_mlp.4.weight"]).T},
        }
        egnn[f"block_{i}"] = block
    return {"egnn": egnn}


def gnn_dynamics_params_from_torch(
    state_dict: Mapping, n_layers: int, hidden_nf: int, attention: bool = False
) -> dict:
    """Reference EGNN_dynamics(mode='gnn_dynamics') state_dict -> flax params.

    Reference keys: `gnn.embedding`, `gnn.gcl_{i}.*`, `gnn.embedding_out`
    (edm/egnn/models.py:51-66 constructing edm/egnn/egnn_new.py:324-361).
    """
    sd = strip_data_parallel(state_dict)
    gnn = {
        "embedding": _dense(sd, "gnn.embedding"),
        "embedding_out": _dense(sd, "gnn.embedding_out"),
    }
    for i in range(n_layers):
        gnn[f"gcl_{i}"] = _gcl_params(sd, f"gnn.gcl_{i}", hidden_nf, attention)
    return {"gnn": gnn}


def predictor_params_from_torch(
    state_dict: Mapping, n_layers: int, hidden_nf: int, attention: bool = True
) -> dict:
    """Reference EGNN_predictor state_dict -> EGNNPredictor flax params."""
    sd = strip_data_parallel(state_dict)
    params = {
        "embedding": _dense(sd, "egnn.embedding"),
        "embedding_out": _dense(sd, "egnn.embedding_out"),
    }
    for i in range(n_layers):
        p = f"egnn.gcl_{i}"
        layer = {
            "edge_in": _split_edge_in(sd, f"{p}.edge_mlp.0", hidden_nf),
            "edge_out": _dense(sd, f"{p}.edge_mlp.2"),
            "node_in": _dense(sd, f"{p}.node_mlp.0"),
            "node_out": _dense(sd, f"{p}.node_mlp.2"),
            "coord_mid": _dense(sd, f"{p}.coord_mlp.0"),
            "coord_gate": {"kernel": _np(sd[f"{p}.coord_mlp.2.weight"]).T},
        }
        if attention:
            layer["att"] = _dense(sd, f"{p}.att_mlp.0")
        params[f"gcl_{i}"] = layer
    return params
