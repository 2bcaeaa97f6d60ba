from gaudi_tpu.diffusion.schedule import (
    clip_noise_schedule,
    polynomial_schedule,
    cosine_beta_schedule,
    NoiseSchedule,
)
from gaudi_tpu.diffusion.edm import EDM, EDMState
