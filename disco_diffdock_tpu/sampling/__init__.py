from .sampler import SamplerConfig, randomize_position, reverse_diffusion, sampling
