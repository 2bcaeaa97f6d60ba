"""GaUDI-TPU: a TPU-native framework for guided diffusion of molecular ring graphs.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of tomer196/GaUDI
(Guided Diffusion for Inverse Molecular Design, Nature Computational Science
2023): an E(3)-equivariant diffusion model over dense padded "graph-of-rings"
point clouds, a time-conditioned EGNN property predictor, and
classifier-guidance sampling — all built TPU-first:

- dense masked [B, N, ...] graph tensors with static shapes (no scatter ops),
- the T-step reverse diffusion as a `lax.scan` fully resident on device,
- guidance gradients via `jax.grad` through the predictor inside the scan,
- data parallelism via `jax.sharding.Mesh` (batch-sharded sampling/training),
- host-side chemistry (ring extraction, stability & validity eval) in
  numpy/networkx with optional RDKit.

Reference parity map lives in each module's docstring (reference file:line).
"""

__version__ = "0.1.0"
