"""Typed configuration for the framework (reference: ~100 argparse flags in
utils/parsing.py consolidated into dataclasses with yaml round-trip, keeping
the run-dir `model_parameters.yml` contract of train.py:153-155).
"""
from __future__ import annotations

import dataclasses

import yaml



@dataclasses.dataclass(frozen=True)
class GraphCaps:
    """Static padded capacities (the TPU replacement for dynamic shapes).

    Bucketed instances of this class bound padding waste; one jit program is
    compiled per bucket.
    """

    max_lig: int = 48
    max_rec: int = 384
    lig_bond_cap: int = 112  # bidirectional bond slots (~2.3x atoms)
    lig_radius_cap: int = 640  # on-device 5A radius pairs
    rec_edge_cap: int = 384 * 24  # precomputed kNN (c_alpha_max_neighbors=24)
    cross_cap: int = 4096  # sigma-dependent dynamic cutoff pairs
    tor_cap: int = 16  # rotatable bonds
    tor_edge_cap: int = 512  # bond-midpoint -> atom edges (5A)
    # all-atom receptor capacities (confidence model family)
    max_atoms: int = 2560
    atom_edge_cap: int = 2560 * 8  # atom radius graph (atom_max_neighbors=8)
    la_cap: int = 1024  # ligand-atom <-> receptor-atom 5A cross edges

    def scaled(self, **kw) -> "GraphCaps":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class ScoreModelConfig:
    """Hyperparameters of the tensor-product score model.

    Defaults = the shipped DisCo-DiffDock-S score model
    (workdir/disco_diffdockS_score_model/model_parameters.yml).
    """

    ns: int = 24
    nv: int = 6
    num_conv_layers: int = 5
    sh_lmax: int = 1
    sigma_embed_dim: int = 32
    distance_embed_dim: int = 32
    cross_distance_embed_dim: int = 32
    in_lig_edge_features: int = 4
    lig_max_radius: float = 5.0
    rec_max_radius: float = 30.0  # distance-embedding range (model default)
    cross_max_distance: float = 80.0
    center_max_distance: float = 30.0
    dynamic_max_cross: bool = True
    use_second_order_repr: bool = False
    batch_norm: bool = True
    dropout: float = 0.1
    scale_by_sigma: bool = True
    no_torsion: bool = False
    embedding_type: str = "sinusoidal"
    embedding_scale: float = 1000.0
    esm_embedding_dim: int = 1280  # 0 disables LM embeddings
    compute_dtype: str = "float32"  # "bfloat16" for the fast inference path
    # Pallas conv fusion: False, "message" (MLP+TP in VMEM), or "block"
    use_pallas_conv: "bool | str" = False
    fuse_w2: bool = False  # concatenate per-block TP-weight matmuls into one
    # jax.checkpoint each conv edge block: backward recomputes the per-edge
    # intermediates instead of storing them (several-fold smaller training
    # HBM footprint for ~1 extra forward of FLOPs; nn/conv.py remat)
    remat: bool = False
    # share one materialized one-hot per edge set across all conv layers
    # (True, default) vs rebuild the iota-compare one-hot at every use so
    # XLA may fuse it into each dot operand and skip the HBM re-reads
    # (False).  A/B probe: benchmarks/onehot_ab.py
    cache_onehots: bool = True
    confidence_mode: bool = False
    # legacy encoder variant (models/layers.py:81-116); the reference defaults
    # this to True for configs predating the flag (model_utils.py:62) -- the
    # shipped paper_confidence_model is such a checkpoint
    use_old_atom_encoder: bool = False
    confidence_dropout: float = 0.0
    confidence_no_batchnorm: bool = False
    num_confidence_outputs: int = 1
    all_atoms: bool = False
    # discrete latents
    latent_dim: int = 2
    latent_vocab: int = 1
    latent_droprate: float = 0.1
    latent_cross_attention: bool = False
    new_cross_attention: bool = False
    cross_attention_heads: int = 1
    cross_attention_dim: int = 64


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """TPEncoder hyperparameters (encoder_* keys of the shipped yml)."""

    ns: int = 24
    nv: int = 4
    num_conv_layers: int = 3
    sh_lmax: int = 1
    distance_embed_dim: int = 32
    cross_distance_embed_dim: int = 32
    in_lig_edge_features: int = 4
    lig_max_radius: float = 5.0
    rec_max_radius: float = 30.0
    cross_max_distance: float = 30.0
    use_second_order_repr: bool = False
    batch_norm: bool = True
    dropout: float = 0.1
    esm_embedding_dim: int = 1280
    latent_dim: int = 2
    latent_vocab: int = 1
    latent_no_batchnorm: bool = False
    latent_dropout: float = 0.0
    latent_hidden_dim: int = 128
    use_oracle: bool = True
    input_latent_dim: int = 0
    apply_gumbel_softmax: bool = True
    remat: bool = False  # see ScoreModelConfig.remat
    latent_virtual_nodes: bool = False
    latent_nodes_residual: bool = False


def save_yaml(path: str, obj) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(obj) if dataclasses.is_dataclass(obj) else obj, f)


def load_yaml(path: str, cls):
    with open(path) as f:
        d = yaml.safe_load(f)
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in fields})
