from .sampler import (ar_conditioning_pose, randomize_position,
                      reverse_diffusion, rotate_ligand, sampling,
                      SamplerConfig)
