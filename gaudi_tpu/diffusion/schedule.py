"""Noise schedules for the variational diffusion model.

The schedule is a precomputed gamma = -log(alpha^2/sigma^2) lookup table of
length T+1, evaluated at continuous t in [0, 1] by nearest-index gather —
a single `jnp.take`, ideal for XLA (no host round trips, no data-dependent
shapes). Mirrors reference edm/equivariant_diffusion/en_diffusion.py:32-81
(polynomial/cosine schedules) and :186-230 (PredefinedNoiseSchedule).

The reference's learned `GammaNetwork` (en_diffusion.py:233-272) is never
selected by any live config (defaults use polynomial_2 + l2). It is rebuilt
here as `GammaNetwork` (same VDM monotone construction, parity-tested
against the torch original) together with
`NoiseSchedule.from_gamma_network`, which tabulates a gamma net onto the
T+1 lookup grid so every existing sampler/loss path can serve it
unchanged. End-to-end VLB training is wired in the trainer:
`EDMConfig(diffusion_noise_schedule="learned", diffusion_loss_type="vlb")`
puts the gamma params into the optimized pytree and retabulates the table
from them inside every loss evaluation (train/trainer_edm.py), matching
the reference's vlb-only restriction on learning the schedule.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def clip_noise_schedule(alphas2: np.ndarray, clip_value: float = 0.001) -> np.ndarray:
    """Clip per-step alpha ratios for sampling stability.

    Mirrors reference en_diffusion.py:32-44.
    """
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = np.clip(alphas_step, a_min=clip_value, a_max=1.0)
    return np.cumprod(alphas_step, axis=0)


def polynomial_schedule(timesteps: int, s: float = 1e-4, power: float = 3.0) -> np.ndarray:
    """alpha^2 schedule (1 - (t/T)^power)^2 with ratio clipping and precision floor.

    Mirrors reference en_diffusion.py:47-61.
    """
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    return precision * alphas2 + s


def cosine_beta_schedule(timesteps: int, s: float = 0.008, raise_to_power: float = 1.0) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule -> cumulative alpha^2.

    Mirrors reference en_diffusion.py:64-81.
    """
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    betas = np.clip(betas, a_min=0, a_max=0.999)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    if raise_to_power != 1:
        alphas_cumprod = np.power(alphas_cumprod, raise_to_power)
    return alphas_cumprod


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed gamma lookup with the VDM sigma/alpha algebra.

    gamma_table[k] = gamma(k / T) for k in 0..T; gamma(t) is evaluated by
    rounding t*T to the nearest index (reference en_diffusion.py:228-230).
    """

    gamma_table: jax.Array  # [T + 1]
    timesteps: int

    @staticmethod
    def create(
        name: str = "polynomial_2", timesteps: int = 1000, precision: float = 1e-5
    ) -> "NoiseSchedule":
        """Build from a schedule name ('cosine' or 'polynomial_<power>').

        Mirrors reference PredefinedNoiseSchedule (en_diffusion.py:191-217).
        """
        if name == "cosine":
            alphas2 = cosine_beta_schedule(timesteps)
        elif "polynomial" in name:
            splits = name.split("_")
            if len(splits) != 2:
                raise ValueError(f"bad polynomial schedule name: {name}")
            power = float(splits[1])
            alphas2 = polynomial_schedule(timesteps, s=precision, power=power)
        else:
            raise ValueError(f"unknown noise schedule: {name}")
        sigmas2 = 1 - alphas2
        gamma = -(np.log(alphas2) - np.log(sigmas2))
        return NoiseSchedule(
            gamma_table=jnp.asarray(gamma, dtype=jnp.float32), timesteps=timesteps
        )

    def gamma(self, t: jax.Array) -> jax.Array:
        """gamma(t) for continuous t in [0, 1]; shape-preserving gather."""
        t_int = jnp.round(t * self.timesteps).astype(jnp.int32)
        return jnp.take(self.gamma_table, t_int)

    def gamma_int(self, t_int: jax.Array) -> jax.Array:
        """gamma at integer step indices 0..T (avoids the round-trip float mul)."""
        return jnp.take(self.gamma_table, t_int)

    @staticmethod
    def sigma(gamma: jax.Array) -> jax.Array:
        """sigma(gamma) = sqrt(sigmoid(gamma)). Reference en_diffusion.py:365-367."""
        return jnp.sqrt(jax.nn.sigmoid(gamma))

    @staticmethod
    def alpha(gamma: jax.Array) -> jax.Array:
        """alpha(gamma) = sqrt(sigmoid(-gamma)). Reference en_diffusion.py:369-373."""
        return jnp.sqrt(jax.nn.sigmoid(-gamma))

    @staticmethod
    def snr(gamma: jax.Array) -> jax.Array:
        """SNR = alpha^2 / sigma^2 = exp(-gamma). Reference en_diffusion.py:375-377."""
        return jnp.exp(-gamma)

    @staticmethod
    def sigma_and_alpha_t_given_s(
        gamma_t: jax.Array, gamma_s: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Transition (sigma^2, sigma, alpha) of q(z_t | z_s) for s < t.

        sigma2_{t|s} = -expm1(softplus(gamma_s) - softplus(gamma_t))
        alpha_{t|s}  = exp(0.5*(logsigmoid(-gamma_t) - logsigmoid(-gamma_s)))
        Mirrors reference en_diffusion.py:433-457.
        """
        sigma2_t_given_s = -jnp.expm1(
            jax.nn.softplus(gamma_s) - jax.nn.softplus(gamma_t)
        )
        log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
        log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
        alpha_t_given_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
        sigma_t_given_s = jnp.sqrt(sigma2_t_given_s)
        return sigma2_t_given_s, sigma_t_given_s, alpha_t_given_s


class GammaNetwork:
    """Learned monotone gamma(t) (VDM construction; reference
    en_diffusion.py:132-166 PositiveLinear + :233-272 GammaNetwork).

    gamma_tilde(t) = l1(t) + l3(sigmoid(l2(l1(t)))) with softplus-positive
    weights (monotone by construction), normalized to [0, 1] over t in
    [0, 1] and affinely rescaled to the learnable [gamma_0, gamma_1].
    Implemented as explicit pytree params + pure functions (no flax
    dependency needed for 3 tiny layers).
    """

    HIDDEN = 1024

    @staticmethod
    def init(key) -> dict:
        import jax.random as jr

        k1, k2, k3, k4, k5, k6 = jr.split(key, 6)

        def kaiming_u(k, shape):
            # torch kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), +)
            fan_in = shape[1]
            bound = 1.0 / np.sqrt(fan_in)
            return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

        # weight_init_offset=-2 per the reference's PositiveLinear
        return {
            "l1_w": kaiming_u(k1, (1, 1)) - 2.0,
            "l1_b": jax.random.uniform(k2, (1,), jnp.float32, -1.0, 1.0),
            "l2_w": kaiming_u(k3, (GammaNetwork.HIDDEN, 1)) - 2.0,
            "l2_b": jax.random.uniform(
                k4, (GammaNetwork.HIDDEN,), jnp.float32, -1.0, 1.0
            ),
            "l3_w": kaiming_u(k5, (1, GammaNetwork.HIDDEN)) - 2.0,
            "l3_b": jax.random.uniform(
                k6, (1,), jnp.float32,
                -1.0 / np.sqrt(GammaNetwork.HIDDEN),
                1.0 / np.sqrt(GammaNetwork.HIDDEN),
            ),
            "gamma_0": jnp.array([-5.0]),
            "gamma_1": jnp.array([10.0]),
        }

    @staticmethod
    def _plin(t, w, b):
        return t @ jax.nn.softplus(w).T + b

    @staticmethod
    def gamma_tilde(params: dict, t: jax.Array) -> jax.Array:
        l1 = GammaNetwork._plin(t, params["l1_w"], params["l1_b"])
        return l1 + GammaNetwork._plin(
            jax.nn.sigmoid(GammaNetwork._plin(l1, params["l2_w"], params["l2_b"])),
            params["l3_w"], params["l3_b"],
        )

    @staticmethod
    def apply(params: dict, t: jax.Array) -> jax.Array:
        """t [B, 1] -> gamma [B, 1], monotone increasing in t."""
        g0 = GammaNetwork.gamma_tilde(params, jnp.zeros_like(t))
        g1 = GammaNetwork.gamma_tilde(params, jnp.ones_like(t))
        gt = GammaNetwork.gamma_tilde(params, t)
        normalized = (gt - g0) / (g1 - g0)
        return params["gamma_0"] + (
            params["gamma_1"] - params["gamma_0"]
        ) * normalized


def from_gamma_network(params: dict, timesteps: int) -> "NoiseSchedule":
    """Tabulate a (trained) GammaNetwork onto the T+1 lookup grid.

    The whole sampler/loss stack consumes gamma through the lookup table,
    so a learned schedule slots in without touching any other code.
    """
    t = jnp.linspace(0.0, 1.0, timesteps + 1)[:, None]
    table = GammaNetwork.apply(params, t)[:, 0]
    return NoiseSchedule(gamma_table=table, timesteps=timesteps)


NoiseSchedule.from_gamma_network = staticmethod(from_gamma_network)
