"""DisCo-DiffDock TPU: a TPU-native (JAX / XLA / Pallas / pjit) framework for
diffusion-based molecular docking with discrete latents.

Re-designed from scratch with the capabilities of the reference
``gcorso/disco-diffdock`` (PyTorch/CUDA research codebase): an SE(3)-equivariant
tensor-product score GNN driving a reverse diffusion over
R^3 x SO(3) x T^m (translation x rigid rotation x torsion angles), with
Gumbel-softmax discrete latents, an autoregressive latent prior, and a
confidence reranker.

TPU-first design principles used throughout:
  * fixed shapes everywhere -- padded node/edge arrays with validity masks
  * the full reverse SDE is one jit-compiled ``lax.scan`` (zero host round-trips)
  * diffusion score tables (IGSO(3), wrapped Gaussian) live in HBM as lookup
    arrays with vectorized interpolation
  * message passing is expressed as dense matmuls (MXU) over edge lists
  * multi-device scaling via ``jax.sharding.Mesh`` + ``shard_map`` collectives
"""

__version__ = "0.1.0"
