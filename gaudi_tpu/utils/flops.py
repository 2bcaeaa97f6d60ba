"""Analytic FLOP model for the dense EGNN compute path.

XLA's `compiled.cost_analysis()` counts the body of a `lax.scan` ONCE,
so for a T-step reverse-diffusion program it under-reports FLOPs by ~T
(measured: 1000x on the guided sampler). Roofline/MFU numbers therefore
use this analytic matmul-dominant count instead; a property test
cross-checks it against XLA's cost analysis on a single un-scanned
forward (tests/test_bf16.py).

Counted terms per GCL layer of the dense [B,N,N,H] EGNN
(models/egnn.py): split-weight src/dst edge projections (2 N H^2 each),
edge-MLP hidden matmul (N^2 H^2), attention gate (N^2 H), node MLP
(2H->H and H->H), and the coordinate-update edge MLP (N^2 H^2 + N^2 H).
A matmul of [m,k]x[k,n] counts 2 m k n FLOPs. Small terms (embeddings,
distance features, biases, elementwise chains) are omitted — this is a
deliberate ~10-20% *under*-estimate, so reported MFU is a floor.
"""

from __future__ import annotations


def egnn_forward_flops(
    n_nodes: int, hidden_nf: int, n_layers: int, batch: int = 1
) -> float:
    """Matmul FLOPs for one dense-EGNN forward pass."""
    n, h = float(n_nodes), float(hidden_nf)
    per_layer = (
        2.0 * n * n * h * h      # edge MLP hidden matmul
        + 2.0 * n * n * h * h    # coordinate-update edge MLP
        + 2.0 * n * n * h        # attention gate + coord scalar head
        + 4.0 * n * h * h        # src/dst split-weight projections
        + 6.0 * n * h * h        # node MLP (2H->H + H->H)
    )
    return batch * n_layers * per_layer


def guided_step_flops(
    batch: int,
    n_nodes: int,
    edm_hidden: int,
    edm_layers: int,
    pred_hidden: int,
    pred_layers: int,
) -> float:
    """FLOPs for one guided reverse-diffusion step: EDM denoiser forward
    plus predictor forward AND backward (backward of a matmul chain costs
    ~2x its forward)."""
    edm = egnn_forward_flops(n_nodes, edm_hidden, edm_layers, batch)
    pred = egnn_forward_flops(n_nodes, pred_hidden, pred_layers, batch)
    return edm + 3.0 * pred
