from setok_tpu.diffusion.gaussian import (GaussianDiffusion, create_diffusion,
                                          get_named_beta_schedule,
                                          space_timesteps)

__all__ = ["GaussianDiffusion", "create_diffusion",
           "get_named_beta_schedule", "space_timesteps"]
