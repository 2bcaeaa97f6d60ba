"""Convert parameter trees between the unfused (nn.Dense) and fused
(Pallas flat-weight) layouts of the EGNN layers.

The fused path (models/egnn.py use_fused=True) stores the edge-trunk weights
flat per layer; this utility lets checkpoints trained with either layout be
served with the other (typically: train unfused anywhere, serve fused on
TPU).
"""

from __future__ import annotations


def _convert_gcl(sub: dict) -> dict:
    """DenseGCL subtree: edge_in/edge_out/att -> flat fused names."""
    out = {k: v for k, v in sub.items() if k in ("node_in", "node_out")}
    out["w_src"] = sub["edge_in"]["src"]["kernel"]
    out["w_dst"] = sub["edge_in"]["dst"]["kernel"]
    out["b_dst"] = sub["edge_in"]["dst"]["bias"]
    out["w_e"] = sub["edge_in"]["edge"]["kernel"]
    out["w2"] = sub["edge_out"]["kernel"]
    out["b2"] = sub["edge_out"]["bias"]
    out["w_a"] = sub["att"]["kernel"]
    out["b_a"] = sub["att"]["bias"].reshape(())
    return out


def _convert_equiv(sub: dict) -> dict:
    """DenseEquivariantUpdate subtree: coord_in/coord_mid/coord_gate."""
    out = {}
    out["w_src"] = sub["coord_in"]["src"]["kernel"]
    out["w_dst"] = sub["coord_in"]["dst"]["kernel"]
    out["b_dst"] = sub["coord_in"]["dst"]["bias"]
    out["w_e"] = sub["coord_in"]["edge"]["kernel"]
    out["w2"] = sub["coord_mid"]["kernel"]
    out["b2"] = sub["coord_mid"]["bias"]
    out["w_g"] = sub["coord_gate"]["kernel"]
    return out


def _convert_pred(sub: dict) -> dict:
    """PredictorEGCL subtree: edge trunk + attention + coord-gate MLP."""
    out = _convert_gcl(sub)
    out["w_mid"] = sub["coord_mid"]["kernel"]
    out["b_mid"] = sub["coord_mid"]["bias"]
    out["w_g"] = sub["coord_gate"]["kernel"]
    return out


def params_to_fused(params):
    """Recursively rewrite an EGNN param tree to the fused layout."""

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if "edge_in" in tree and "coord_mid" in tree and "att" in tree:
            return _convert_pred(tree)
        if "edge_in" in tree and "edge_out" in tree and "att" in tree:
            return _convert_gcl(tree)
        if "coord_in" in tree and "coord_gate" in tree:
            return _convert_equiv(tree)
        return {k: walk(v) for k, v in tree.items()}

    return walk(params)
