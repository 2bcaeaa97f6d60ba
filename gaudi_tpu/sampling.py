"""Batch sampling helpers: node-count -> masks -> jitted reverse diffusion.

Rebuild of reference sampling_edm.py:65-265. The helpers compile one jitted
sampler per (batch, nodes, std/scale) configuration and reuse it across
calls; the masks are built on device from node counts (the reference builds
them in Python per call, sampling_edm.py:135-161).

Sampling temperature defaults match the reference: std=0.7 for unconditional
(:128), std=1.0 for guidance (:172).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaudi_tpu.core import masked as M
from gaudi_tpu.diffusion.edm import EDM, TargetFn


def rotate_chain_frames(xh: jnp.ndarray, n_steps: int = 90) -> jnp.ndarray:
    """Append a slow 3-axis rotation of the final frame for chain GIFs.

    Mirrors reference rotate_chain (sampling_edm.py:15-58); xh is a single
    [N, 3+K] frame, returns [n_steps, N, 3+K].
    """
    theta = np.pi / n_steps
    cz, sz = np.cos(theta), np.sin(theta)
    qz = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    qx = np.array([[1.0, 0.0, 0.0], [0.0, cz, -sz], [0.0, sz, cz]])
    qy = np.array([[cz, 0.0, sz], [0.0, 1.0, 0.0], [-sz, 0.0, cz]])
    q = jnp.asarray(qz @ qx @ qy, xh.dtype)

    def body(carry, _):
        x = carry[:, :3] @ q.T
        nxt = jnp.concatenate([x, carry[:, 3:]], axis=1)
        return nxt, nxt

    _, frames = jax.lax.scan(body, xh, None, length=n_steps)
    return frames


class Sampler:
    """Jitted sampling front-end bound to one EDM + parameter set.

    With a mesh, the molecule batch (node-count vector) is sharded along the
    "data" axis and each chip runs the full reverse scan on its shard —
    sampling is embarrassingly parallel (SURVEY.md §2.5).
    """

    def __init__(self, edm: EDM, max_nodes: int, orientation: bool = False,
                 mesh=None, mp_mode=None, dataset: str = ""):
        """mp_mode: optional PARALLELISM_RULES key ("tp"/"sp") activating the
        model axis of a 2-D mesh inside the reverse scan (see parallel/mesh.py);
        None = batch-sharded DP only. dataset: name used to build
        dataset-aware polish priors (e.g. "angles3" window tables);
        defaults to "hetro" when orientation is set, else "cata"."""
        self.edm = edm
        self.max_nodes = max_nodes
        self.orientation = orientation
        self.mesh = mesh
        self.mp_mode = mp_mode
        self.dataset = dataset or ("hetro" if orientation else "cata")

    def _shardings(self, has_context: bool = False):
        if self.mesh is None:
            return {}
        from gaudi_tpu.parallel.mesh import batch_sharding, replicated_sharding

        rep = replicated_sharding(self.mesh)
        bs = batch_sharding(self.mesh)
        ins = (rep, rep, bs) + ((bs,) if has_context else ())
        return {"in_shardings": ins, "out_shardings": (bs, bs, bs, bs)}

    @lru_cache(maxsize=8)
    def _jit_sample(self, std: float, n_steps=None, polish: int = 0,
                    polish_t: float = 0.08, polish_noise: float = 1.0,
                    polish_steps: int = 12, polish_decay: float = 0.6,
                    polish_guide: str = "", polish_guide_scale: float = 0.0,
                    has_context: bool = False, cfg_weight: float = 0.0,
                    solver: str = "ancestral", solver_order: int = 2):
        guide_fn = None
        if polish and polish_guide and polish_guide_scale:
            from gaudi_tpu.diffusion.priors import get_prior

            guide_fn = get_prior(
                polish_guide, dataset=self.dataset, max_nodes=self.max_nodes,
                orientation=self.orientation, norm_x=self.edm.norm_values[0],
            )

        # Conditional model / classifier-free guidance: derive the
        # CFG-combined denoiser once; every reverse path below (plain,
        # strided, polish) uses it transparently (diffusion/cfg.py).
        edm = self.edm
        if has_context and cfg_weight:
            from gaudi_tpu.diffusion.cfg import with_cfg

            edm = with_cfg(edm, cfg_weight)

        def fn(params, key, n_nodes, y_ctx=None):
            node_mask, edge_mask = M.build_masks(
                n_nodes, self.max_nodes, self.orientation
            )
            context = None
            if has_context:
                from gaudi_tpu.diffusion.cfg import build_context

                context = build_context(y_ctx, node_mask)
            # split only when polishing: the plain path must stay
            # key-for-key identical to sample_guidance(scale=0)
            k_s, k_p = (jax.random.split(key) if polish else (key, key))
            if solver == "dpmpp":
                from gaudi_tpu.diffusion.solvers import sample_dpmpp

                x, h = sample_dpmpp(
                    edm, params, k_s, node_mask, edge_mask, std=std,
                    n_steps=n_steps or 25, order=solver_order,
                    context=context,
                )
            else:
                x, h = edm.sample(
                    params, k_s, node_mask, edge_mask, std=std,
                    n_steps=n_steps, context=context,
                )
            if polish:
                x, h = edm.polish(
                    params, k_p, x, h, node_mask, edge_mask,
                    t_start=polish_t, rounds=polish, noise_scale=polish_noise,
                    n_steps=polish_steps, t_decay=polish_decay,
                    guide_fn=guide_fn, guide_scale=polish_guide_scale,
                    context=context,
                )
            return x, h, node_mask, edge_mask

        from gaudi_tpu.parallel.mesh import call_with_rules

        return call_with_rules(
            jax.jit(fn, **self._shardings(has_context)),
            self.mesh,
            self.mp_mode,
        )

    @lru_cache(maxsize=8)
    def _jit_chain(self, std: float, keep_frames: int, n_steps=None,
                   has_context: bool = False, solver: str = "ancestral",
                   solver_order: int = 2):
        def fn(params, key, n_nodes, y_ctx=None):
            node_mask, edge_mask = M.build_masks(
                n_nodes, self.max_nodes, self.orientation
            )
            context = None
            if has_context:
                from gaudi_tpu.diffusion.cfg import build_context

                context = build_context(y_ctx, node_mask)
            if solver == "dpmpp":
                from gaudi_tpu.diffusion.solvers import sample_dpmpp_chain

                return sample_dpmpp_chain(
                    self.edm, params, key, node_mask, edge_mask, std=std,
                    n_steps=n_steps or 25, order=solver_order,
                    context=context,
                )
            return self.edm.sample_chain(
                params, key, node_mask, edge_mask, keep_frames=keep_frames,
                std=std, n_steps=n_steps, context=context,
            )

        return jax.jit(fn)

    def sample(self, params, key, nodesxsample, std: float = 0.7, n_steps=None,
               polish: int = 0, polish_t: float = 0.08, polish_noise: float = 1.0,
               polish_steps: int = 12, polish_decay: float = 0.6,
               polish_guide: str = "", polish_guide_scale: float = 0.0,
               context=None, cfg_weight: float = 0.0,
               solver: str = "ancestral", solver_order: int = 2):
        """Molecules from the (un)conditional model (reference
        sample_pos_edm :128-169).

        nodesxsample: [B] ring counts. Returns (x, h_onehot, node_mask,
        edge_mask) with x CoM-free and masked. n_steps < T opts into the
        strided few-step sampler; polish > 0 appends that many SDEdit
        manifold-projection rounds; polish_guide names a physics prior from
        diffusion/priors.py applied inside those rounds. For a conditional
        model (EDMConfig.context_features), `context` is the [B, C]
        normalized conditioning values and cfg_weight > 0 applies
        classifier-free guidance (diffusion/cfg.py). solver="dpmpp" swaps
        the ancestral reverse chain for the DPM-Solver++ ODE integrator
        (diffusion/solvers.py; n_steps defaults to 25 there, solver_order
        1 = DDIM). (All beyond-reference knobs.)
        """
        n_nodes = jnp.asarray(nodesxsample, jnp.int32)
        has_ctx = context is not None
        fn = self._jit_sample(
            float(std), n_steps, int(polish), float(polish_t),
            float(polish_noise), int(polish_steps), float(polish_decay),
            str(polish_guide), float(polish_guide_scale),
            has_ctx, float(cfg_weight) if has_ctx else 0.0,
            str(solver), int(solver_order),
        )
        if has_ctx:
            return fn(params, key, n_nodes, jnp.asarray(context, jnp.float32))
        return fn(params, key, n_nodes)

    def sample_chain(
        self, params, key, n_nodes: int = 10, keep_frames: int = 100,
        std: float = 0.7, n_steps=None, context=None,
        solver: str = "ancestral", solver_order: int = 2,
    ):
        """Single-molecule denoising trajectory for visualization
        (reference sample_chain_pos :65-116). Returns [frames, N', 3+K]
        oldest-noise-first (keep_frames frames; for solver="dpmpp" the
        trajectory has n_steps+1 frames and keep_frames is ignored).
        `context`: [1, C] conditioning values for a conditional model."""
        counts = jnp.full((1,), n_nodes, jnp.int32)
        has_ctx = context is not None
        fn = self._jit_chain(float(std), int(keep_frames), n_steps, has_ctx,
                             str(solver), int(solver_order))
        if has_ctx:
            chain = fn(params, key, counts, jnp.asarray(context, jnp.float32))
        else:
            chain = fn(params, key, counts)
        return chain[::-1, 0]  # frame 0 noisiest, last frame = final sample

    def make_guided_sampler(
        self, target_function: TargetFn, std: float = 1.0, n_steps=None,
        has_context: bool = False, cfg_weight: float = 0.0,
        solver: str = "ancestral", solver_order: int = 2,
    ) -> Callable:
        """Compile a guided sampler for a user target function
        (reference sample_guidance :172-224). Cached per
        (fn, std, n_steps, has_context, cfg_weight, solver) so repeated
        sample_guidance calls reuse the compiled program. For a conditional
        EDM the context conditions the denoiser inside every guided step
        (cfg_weight > 0 additionally applies the CFG combination — classifier
        guidance and classifier-free guidance compose). solver="dpmpp"
        integrates the PF-ODE with the same bounded post-step guidance
        moves (diffusion/solvers.py)."""
        key = (target_function, float(std), n_steps, has_context, cfg_weight,
               solver, solver_order)
        cached = getattr(self, "_guided_cache", None)
        if cached is None:
            cached = self._guided_cache = {}
        if key in cached:
            return cached[key]

        edm = self.edm
        if has_context and cfg_weight:
            from gaudi_tpu.diffusion.cfg import with_cfg

            edm = with_cfg(edm, cfg_weight)

        def fn(params, key, n_nodes, scale, y_ctx=None):
            node_mask, edge_mask = M.build_masks(
                n_nodes, self.max_nodes, self.orientation
            )
            context = None
            if has_context:
                from gaudi_tpu.diffusion.cfg import build_context

                context = build_context(y_ctx, node_mask)
            if solver == "dpmpp":
                from gaudi_tpu.diffusion.solvers import sample_dpmpp

                x, h = sample_dpmpp(
                    edm, params, key, node_mask, edge_mask, std=std,
                    n_steps=n_steps or 25, order=solver_order,
                    context=context, target_fn=target_function, scale=scale,
                )
            else:
                x, h = edm.sample_guidance(
                    params,
                    key,
                    target_function,
                    node_mask,
                    edge_mask,
                    scale=scale,
                    std=std,
                    n_steps=n_steps,
                    context=context,
                )
            return x, h, node_mask, edge_mask

        sh = self._shardings()
        if sh:
            from gaudi_tpu.parallel.mesh import batch_sharding, replicated_sharding

            rep = replicated_sharding(self.mesh)
            bs = batch_sharding(self.mesh)
            ins = (rep, rep, bs, rep) + ((bs,) if has_context else ())
            sh = {"in_shardings": ins, "out_shardings": (bs, bs, bs, bs)}
        from gaudi_tpu.parallel.mesh import call_with_rules

        jitted = call_with_rules(jax.jit(fn, **sh), self.mesh, self.mp_mode)
        cached[key] = jitted
        return jitted

    def sample_guidance(
        self,
        params,
        key,
        target_function: TargetFn,
        nodesxsample,
        scale: float = 1.0,
        std: float = 1.0,
        n_steps=None,
        context=None,
        cfg_weight: float = 0.0,
        solver: str = "ancestral",
        solver_order: int = 2,
    ):
        has_ctx = context is not None
        fn = self.make_guided_sampler(
            target_function, std, n_steps, has_ctx,
            float(cfg_weight) if has_ctx else 0.0,
            str(solver), int(solver_order),
        )
        n_nodes = jnp.asarray(nodesxsample, jnp.int32)
        if has_ctx:
            return fn(params, key, n_nodes, jnp.float32(scale),
                      jnp.asarray(context, jnp.float32))
        return fn(params, key, n_nodes, jnp.float32(scale))


def to_molecule_list(
    x, h, node_mask, orientation: bool = False, max_nodes: Optional[int] = None
):
    """Device batch -> host list [(positions, ring_types)] for eval_chem.

    For orientation mode the eval contract keeps ring rows and orientation
    rows concatenated (reference passes the full doubled tensor,
    eval via analyze.py:65-76).
    """
    x = np.asarray(x)
    h = np.asarray(h)
    nm = np.asarray(node_mask)[..., 0].astype(bool)
    out = []
    for i in range(x.shape[0]):
        if orientation:
            n = max_nodes
            alive = nm[i, :n]
            xi = np.concatenate([x[i, :n][alive], x[i, n:][alive]])
            ti = np.concatenate(
                [h[i, :n][alive].argmax(-1), h[i, n:][alive].argmax(-1)]
            )
        else:
            xi = x[i][nm[i]]
            ti = h[i][nm[i]].argmax(-1)
        out.append((xi, ti))
    return out
