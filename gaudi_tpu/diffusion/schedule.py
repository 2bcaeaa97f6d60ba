"""Noise schedules for the variational diffusion model.

The schedule is a precomputed gamma = -log(alpha^2/sigma^2) lookup table of
length T+1, evaluated at continuous t in [0, 1] by nearest-index gather —
a single `jnp.take`, ideal for XLA (no host round trips, no data-dependent
shapes). Mirrors reference edm/equivariant_diffusion/en_diffusion.py:32-81
(polynomial/cosine schedules) and :186-230 (PredefinedNoiseSchedule).

The reference's learned `GammaNetwork` (en_diffusion.py:233-272) is never
selected by any live config (defaults use polynomial_2 + l2); we deliberately
do not rebuild it (see SURVEY.md §2.6 dead code).
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
