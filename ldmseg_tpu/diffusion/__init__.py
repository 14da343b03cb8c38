from .ddim import (
    DDIMSchedule,
    make_ddim_schedule,
    compute_loss_weights,
    inference_timesteps,
    add_noise,
    remove_noise,
    ddim_step,
)
from .sampler import ddim_sample, ddim_refine
from .dpm import dpmpp_2m_sample

__all__ = [
    "DDIMSchedule",
    "make_ddim_schedule",
    "compute_loss_weights",
    "inference_timesteps",
    "add_noise",
    "remove_noise",
    "ddim_step",
    "ddim_sample",
    "ddim_refine",
    "dpmpp_2m_sample",
]
