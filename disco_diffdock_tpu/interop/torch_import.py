"""Reference PyTorch checkpoint <-> flax parameter-tree conversion.

Imports the reference's trained ``state_dict`` files (torch, e3nn/torch_geometric
module naming) into this framework's flax variables, and exports back.  A
user migrating from the reference brings their trained weights
(``best_ema_model.pt`` etc., saved by /root/reference/train.py:66-90,
confidence_train.py:229-245, train_ar.py:248-269) and runs them through this
framework's eval/dock/serve drivers unchanged.

Supported families (``kind``):
  * ``"score"``      -- bare CG TensorProductScoreModel (score or confidence
                        mode), reference models/score_model.py.
  * ``"wrapper"``    -- ModelWrapper(encoder=TPEncoder, score_model=CG model),
                        reference models/model_classes.py:53 (keys
                        ``encoder.*`` / ``score_model.*``).
  * ``"encoder"``    -- bare TPEncoder, reference models/latent_encoder.py.
  * ``"ar"``         -- PretrainedScoreEncoder, reference
                        models/pretrained_score_encoder.py (score-model head
                        keys present in the checkpoint are dropped: the AR
                        forward only uses ``embed``).
  * ``"all_atom"``   -- all-atom TensorProductScoreModel, reference
                        models/all_atom_score_model.py (the shipped
                        confidence model).

Weight-layout facts the mapping relies on (see interop/tp_layout.py):
  * reference TP weights live in the edge-MLP final Linear; rows = flat TP
    weight indices.  FasterTensorProduct rows are byte-identical to our "fo"
    layout; FullyConnectedTensorProduct rows need the e3nn-instruction ->
    per-output-block permutation and the per-path CG signs.
  * torch ``nn.Linear`` weight is (out, in) -> flax Dense kernel (in, out).
  * e3nn ``BatchNorm`` <-> MaskedIrrepsBatchNorm share semantics and channel
    order; torch ``BatchNorm1d`` maps onto an all-scalar irreps batchnorm.

Not supported (raises): ``latent_virtual_nodes`` encoders (TransformerConv
stack; no shipped checkpoint uses it), non-sinusoidal time embeddings (the
reference draws the Fourier W outside the module, so it is not in the
state_dict and cannot be recovered -- utils/diffusion_utils.py:84-94).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import EncoderConfig, ScoreModelConfig
from ..nn.tensor_product import FullTensorProduct, WeightedTensorProduct, get_irrep_seq
from .tp_layout import fctp_weight_transform, full_tp_block_map

__all__ = ["import_state_dict", "export_state_dict", "DROPPED_KEY_SUFFIXES"]

# reference buffers that carry no information the configs don't already
# determine (GaussianSmearing grids: tensor_layers.py:171-181), plus torch
# BatchNorm1d's step counter
DROPPED_KEY_SUFFIXES = (".offset", ".num_batches_tracked")


# ---------------------------------------------------------------------------
# nested-dict helpers
# ---------------------------------------------------------------------------

def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    assert parts[-1] not in node, f"duplicate target {path}"
    node[parts[-1]] = np.asarray(value)


def _get(tree: dict, path: str) -> np.ndarray:
    node = tree
    for p in path.split("/"):
        node = node[p]
    return np.asarray(node)


class _SD:
    """state_dict view with consumption tracking."""

    def __init__(self, sd: dict):
        self.sd = dict(sd)
        self.used: set = set()

    def take(self, key: str) -> np.ndarray:
        assert key in self.sd, f"reference checkpoint is missing key: {key}"
        self.used.add(key)
        v = self.sd[key]
        # torch tensors and numpy arrays both satisfy np.asarray
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def has(self, key: str) -> bool:
        return key in self.sd

    def put(self, key: str, value: np.ndarray) -> None:
        assert key not in self.sd, f"duplicate export key {key}"
        self.sd[key] = np.asarray(value)

    def leftovers(self, extra_drop=()) -> list:
        out = []
        for k in self.sd:
            if k in self.used:
                continue
            if k.endswith(DROPPED_KEY_SUFFIXES):
                continue
            if any(k.startswith(p) for p in extra_drop):
                continue
            out.append(k)
        return sorted(out)


# ---------------------------------------------------------------------------
# mapping entries
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Linear:
    """torch nn.Linear <-> flax Dense (kernel transposed)."""

    ref: str  # e.g. "lig_edge_embedding.0"
    ours: str  # e.g. "lig_edge_embedding/Dense_0"
    bias: bool = True

    def imp(self, sd: _SD, params: dict, stats: dict) -> None:
        _set(params, self.ours + "/kernel", sd.take(self.ref + ".weight").T)
        if self.bias:
            _set(params, self.ours + "/bias", sd.take(self.ref + ".bias"))

    def exp(self, params: dict, stats: dict, sd: _SD) -> None:
        sd.put(self.ref + ".weight", _get(params, self.ours + "/kernel").T)
        if self.bias:
            sd.put(self.ref + ".bias", _get(params, self.ours + "/bias"))


@dataclasses.dataclass
class _Direct:
    """same-shape tensor copy (embeddings, unconditional embeddings)."""

    ref: str
    ours: str

    def imp(self, sd: _SD, params: dict, stats: dict) -> None:
        _set(params, self.ours, sd.take(self.ref))

    def exp(self, params: dict, stats: dict, sd: _SD) -> None:
        sd.put(self.ref, _get(params, self.ours))


@dataclasses.dataclass
class _IrrepsBN:
    """e3nn nn.BatchNorm <-> MaskedIrrepsBatchNorm (+ running stats)."""

    ref: str  # e.g. "conv_layers.0.batch_norm"
    ours: str  # e.g. "conv0/MaskedIrrepsBatchNorm_0"
    has_scalars: bool = True

    def imp(self, sd: _SD, params: dict, stats: dict) -> None:
        _set(params, self.ours + "/weight", sd.take(self.ref + ".weight"))
        _set(stats, self.ours + "/var", sd.take(self.ref + ".running_var"))
        if self.has_scalars:
            _set(params, self.ours + "/bias", sd.take(self.ref + ".bias"))
            _set(stats, self.ours + "/mean", sd.take(self.ref + ".running_mean"))

    def exp(self, params: dict, stats: dict, sd: _SD) -> None:
        sd.put(self.ref + ".weight", _get(params, self.ours + "/weight"))
        sd.put(self.ref + ".running_var", _get(stats, self.ours + "/var"))
        if self.has_scalars:
            sd.put(self.ref + ".bias", _get(params, self.ours + "/bias"))
            sd.put(self.ref + ".running_mean", _get(stats, self.ours + "/mean"))


@dataclasses.dataclass
class _TorchBN1d:
    """torch nn.BatchNorm1d <-> all-scalar MaskedIrrepsBatchNorm."""

    ref: str
    ours: str

    def imp(self, sd: _SD, params: dict, stats: dict) -> None:
        _set(params, self.ours + "/weight", sd.take(self.ref + ".weight"))
        _set(params, self.ours + "/bias", sd.take(self.ref + ".bias"))
        _set(stats, self.ours + "/var", sd.take(self.ref + ".running_var"))
        _set(stats, self.ours + "/mean", sd.take(self.ref + ".running_mean"))

    def exp(self, params: dict, stats: dict, sd: _SD) -> None:
        sd.put(self.ref + ".weight", _get(params, self.ours + "/weight"))
        sd.put(self.ref + ".bias", _get(params, self.ours + "/bias"))
        sd.put(self.ref + ".running_var", _get(stats, self.ours + "/var"))
        sd.put(self.ref + ".running_mean", _get(stats, self.ours + "/mean"))


@dataclasses.dataclass
class _ConvFC:
    """One edge-MLP group of a TensorProductConvLayer.

    ``ref_fc``: reference FCBlock/Sequential prefix (e.g. "conv_layers.0.fc.2"
    for CG edge group 2, "final_conv.fc", "conv_layers.3.fc" all-atom).
    ``fc_idx``: Linear indices inside the Sequential -- (0, 4) for the CG
    FCBlock (models/layers.py:15-22: Linear, Identity, ReLU, Dropout, Linear),
    (0, 3) for the all-atom inline Sequential (all_atom_score_model.py:29-34).
    ``perm``/``signs``: flat TP-row transform (None = faster layout identity).
    """

    ref_fc: str
    ours: str  # e.g. "conv0" -- group g params are fc{g}_*
    group: int
    weight_splits: tuple
    fc_idx: tuple = (0, 4)
    perm: Optional[np.ndarray] = None
    signs: Optional[np.ndarray] = None

    def imp(self, sd: _SD, params: dict, stats: dict) -> None:
        g = self.group
        i1, i2 = self.fc_idx
        w1 = sd.take(f"{self.ref_fc}.{i1}.weight")
        b1 = sd.take(f"{self.ref_fc}.{i1}.bias")
        _set(params, f"{self.ours}/fc{g}_w1", w1.T)
        _set(params, f"{self.ours}/fc{g}_b1", b1)
        W = sd.take(f"{self.ref_fc}.{i2}.weight")  # (numel, hidden)
        B = sd.take(f"{self.ref_fc}.{i2}.bias")
        if self.perm is not None:
            W = W[self.perm] * self.signs[:, None]
            B = B[self.perm] * self.signs
        ofs = 0
        for k, d in enumerate(self.weight_splits):
            if d == 0:
                continue
            _set(params, f"{self.ours}/fc{g}_w2_{k}", W[ofs : ofs + d].T)
            _set(params, f"{self.ours}/fc{g}_b2_{k}", B[ofs : ofs + d])
            ofs += d
        assert ofs == W.shape[0]

    def exp(self, params: dict, stats: dict, sd: _SD) -> None:
        g = self.group
        i1, i2 = self.fc_idx
        sd.put(f"{self.ref_fc}.{i1}.weight", _get(params, f"{self.ours}/fc{g}_w1").T)
        sd.put(f"{self.ref_fc}.{i1}.bias", _get(params, f"{self.ours}/fc{g}_b1"))
        Ws, Bs = [], []
        for k, d in enumerate(self.weight_splits):
            if d == 0:
                continue
            Ws.append(_get(params, f"{self.ours}/fc{g}_w2_{k}").T)
            Bs.append(_get(params, f"{self.ours}/fc{g}_b2_{k}"))
        W = np.concatenate(Ws, 0)
        B = np.concatenate(Bs, 0)
        if self.perm is not None:
            inv = np.empty_like(self.perm)
            inv[self.perm] = np.arange(len(self.perm))
            W = (W * self.signs[:, None])[inv]
            B = (B * self.signs)[inv]
        sd.put(f"{self.ref_fc}.{i2}.weight", W)
        sd.put(f"{self.ref_fc}.{i2}.bias", B)


# ---------------------------------------------------------------------------
# per-family mapping builders
# ---------------------------------------------------------------------------

def _sh_spec(lmax: int) -> str:
    return " + ".join(["1x0e"] + [f"1x{l}{'eo'[l % 2]}" for l in range(1, lmax + 1)])


def _atom_encoder_entries(ref: str, ours: str, n_embeds: int, has_dense: bool,
                          old: bool = False, has_lm: bool = False) -> list:
    """AtomEncoder (models/layers.py:119-149) / OldAtomEncoder (:81-116)."""
    ents = [
        _Direct(f"{ref}.atom_embedding_list.{i}.weight", f"{ours}/Embed_{i}/embedding")
        for i in range(n_embeds)
    ]
    if old:
        ents.append(_Linear(f"{ref}.linear", f"{ours}/Dense_0"))
        if has_lm:
            ents.append(_Linear(f"{ref}.lm_embedding_layer", f"{ours}/Dense_1"))
    elif has_dense:
        ents.append(_Linear(f"{ref}.additional_features_embedder", f"{ours}/Dense_0"))
    return ents


def _seq_embedding_entries(ref: str, ours: str) -> list:
    """nn.Sequential(Linear, ReLU, Dropout, Linear) edge embeddings."""
    return [_Linear(f"{ref}.0", f"{ours}/Dense_0"), _Linear(f"{ref}.3", f"{ours}/Dense_1")]


def _conv_entries(
    ref: str,
    ours: str,
    in_ir: str,
    out_ir: str,
    sh_lmax: int,
    faster: bool,
    groups: int,
    fc_idx: tuple,
    tor_ftp: bool = False,
    batch_norm: bool = True,
) -> list:
    """One TensorProductConvLayer (reference tensor_layers.py:119-168 or
    all_atom_score_model.py:15-50)."""
    sh = _sh_spec(sh_lmax)
    if tor_ftp:
        # the torsion head's sh comes from FullTensorProduct(sh, '2e'):
        # ours keeps generation order, e3nn sorts its output irreps
        info = full_tp_block_map(sh, "1x2e")
        ftp = FullTensorProduct(sh, "1x2e")
        ours_sh_blocks = [(mi.mul, mi.ir.l, mi.ir.p) for mi in ftp.irreps_out]
        wtp = WeightedTensorProduct(in_ir, str(ftp.irreps_out), out_ir)
        perm, signs = fctp_weight_transform(
            in_ir, ours_sh_blocks, out_ir,
            sh_irreps_e3nn=info.e3nn_irreps,
            sh_block_map=info.ours_to_e3nn,
            sh_block_signs=info.block_signs,
        )
    else:
        wtp = WeightedTensorProduct(in_ir, sh, out_ir)
        if faster:
            perm = signs = None
        else:
            perm, signs = fctp_weight_transform(in_ir, sh, out_ir)
    splits = tuple(wtp.weight_splits)
    ents = []
    for g in range(groups):
        ref_fc = f"{ref}.fc.{g}" if groups > 1 else f"{ref}.fc"
        ents.append(
            _ConvFC(ref_fc, ours, g, splits, fc_idx=fc_idx, perm=perm, signs=signs)
        )
    if batch_norm:
        has_scalars = any(mi.ir.l == 0 and mi.ir.p == 1 for mi in wtp.out_irreps)
        ents.append(
            _IrrepsBN(f"{ref}.batch_norm", f"{ours}/MaskedIrrepsBatchNorm_0", has_scalars)
        )
    return ents


def _predictor_entries(ref: str, ours: str, no_batchnorm: bool) -> list:
    """The 3-Linear latent/confidence predictor Sequential
    (Linear, BN1d|Id, ReLU, Dropout) x2 + Linear -> indices 0,1,4,5,8."""
    ents = [_Linear(f"{ref}.0", f"{ours}/Dense_0")]
    if not no_batchnorm:
        ents.append(_TorchBN1d(f"{ref}.1", f"{ours}/MaskedIrrepsBatchNorm_0"))
    ents.append(_Linear(f"{ref}.4", f"{ours}/Dense_1"))
    if not no_batchnorm:
        ents.append(_TorchBN1d(f"{ref}.5", f"{ours}/MaskedIrrepsBatchNorm_1"))
    ents.append(_Linear(f"{ref}.8", f"{ours}/Dense_2"))
    return ents


N_LIG_FEATURES = 16  # categorical ligand feature tables (process_mols.py:27-64)
N_REC_FEATURES = 1  # residue identity
N_ATOM_FEATURES = 4  # all-atom receptor atom features


def _score_model_entries(cfg: ScoreModelConfig, ref: str = "", ours: str = "") -> list:
    """CG TensorProductScoreModel (reference models/score_model.py:14-167)."""
    assert cfg.embedding_type == "sinusoidal", (
        "non-sinusoidal time embeddings draw parameters outside the reference "
        "module and cannot be imported (utils/diffusion_utils.py:84-94)"
    )
    assert not cfg.all_atoms
    rp = (ref + ".") if ref else ""
    op = (ours + "/") if ours else ""
    has_lm = cfg.esm_embedding_dim > 0
    old = cfg.use_old_atom_encoder
    ents = []
    ents += _atom_encoder_entries(
        f"{rp}lig_node_embedding", f"{op}lig_node_embedding", N_LIG_FEATURES,
        has_dense=True, old=old,
    )
    ents += _atom_encoder_entries(
        f"{rp}rec_node_embedding", f"{op}rec_node_embedding", N_REC_FEATURES,
        has_dense=True, old=old, has_lm=has_lm,
    )
    for name in ("lig_edge_embedding", "rec_edge_embedding", "cross_edge_embedding"):
        ents += _seq_embedding_entries(f"{rp}{name}", f"{op}{name}")
    if cfg.latent_droprate > 0:
        for a, b in [
            ("lig_node_unconditional_embedding", "lig_node_uncond"),
            ("rec_node_unconditional_embedding", "rec_node_uncond"),
            ("lig_edge_unconditional_embedding", "lig_edge_uncond"),
            ("rec_edge_unconditional_embedding", "rec_edge_uncond"),
            ("cross_edge_unconditional_embedding", "cross_edge_uncond"),
        ]:
            ents.append(_Direct(f"{rp}{a}", f"{op}{b}"))
    if cfg.latent_cross_attention and cfg.latent_vocab > 1:
        for i in range(cfg.latent_dim):
            ents += [
                _Linear(f"{rp}latent_embedding_layers.{i}.0", f"{op}lat_emb{i}/Dense_0"),
                _Linear(f"{rp}latent_embedding_layers.{i}.4", f"{op}lat_emb{i}/Dense_1"),
            ]
        for i in range(cfg.num_conv_layers):
            ents += [
                _Linear(f"{rp}latent_residual_layers.{i}.0", f"{op}lat_res{i}/Dense_0"),
                _Linear(f"{rp}latent_residual_layers.{i}.4", f"{op}lat_res{i}/Dense_1"),
            ]
            if cfg.new_cross_attention:
                for t in ("q", "k", "v"):
                    ents.append(
                        _Linear(f"{rp}cross_attention_layers.{i}.to_{t}",
                                f"{op}lat_xattn{i}/Dense_{'qkv'.index(t)}", bias=False)
                    )
                ents.append(
                    _Linear(f"{rp}cross_attention_layers.{i}.to_out.0",
                            f"{op}lat_xattn{i}/Dense_3")
                )
    seq = get_irrep_seq(cfg.ns, cfg.nv, cfg.use_second_order_repr)
    faster = cfg.sh_lmax == 1 and not cfg.use_second_order_repr
    for i in range(cfg.num_conv_layers):
        in_ir = seq[min(i, 3)]
        out_ir = seq[min(i + 1, 3)]
        ents += _conv_entries(
            f"{rp}conv_layers.{i}", f"{op}conv{i}", in_ir, out_ir, cfg.sh_lmax,
            faster, groups=4, fc_idx=(0, 4), batch_norm=cfg.batch_norm,
        )
    trunk_out = seq[min(cfg.num_conv_layers, 3)]
    if cfg.confidence_mode:
        ents += _predictor_entries_confidence(rp, op, cfg)
    else:
        ents += _seq_embedding_entries(f"{rp}center_edge_embedding", f"{op}center_edge_embedding")
        ents += _conv_entries(
            f"{rp}final_conv", f"{op}final_conv", trunk_out, "2x1o + 2x1e",
            cfg.sh_lmax, faster=False, groups=1, fc_idx=(0, 4),
            batch_norm=cfg.batch_norm,
        )
        ents += [
            _Linear(f"{rp}tr_final_layer.0", f"{op}tr_final_dense1"),
            _Linear(f"{rp}tr_final_layer.3", f"{op}tr_final_dense2"),
            _Linear(f"{rp}rot_final_layer.0", f"{op}rot_final_dense1"),
            _Linear(f"{rp}rot_final_layer.3", f"{op}rot_final_dense2"),
        ]
        if not cfg.no_torsion:
            ents += _seq_embedding_entries(f"{rp}final_edge_embedding", f"{op}final_edge_embedding")
            ents += _conv_entries(
                f"{rp}tor_bond_conv", f"{op}tor_bond_conv", trunk_out,
                f"{cfg.ns}x0o + {cfg.ns}x0e", cfg.sh_lmax, faster=False,
                groups=1, fc_idx=(0, 4), tor_ftp=True, batch_norm=cfg.batch_norm,
            )
            ents += [
                _Linear(f"{rp}tor_final_layer.0", f"{op}tor_final_dense1", bias=False),
                _Linear(f"{rp}tor_final_layer.3", f"{op}tor_final_dense2", bias=False),
            ]
    return ents


def _predictor_entries_confidence(rp: str, op: str, cfg: ScoreModelConfig) -> list:
    """confidence_predictor Sequential (score_model.py:115-126 /
    all_atom_score_model.py:147-161) -> confidence_mlp1/bn1/mlp2/bn2/out."""
    ents = [_Linear(f"{rp}confidence_predictor.0", f"{op}confidence_mlp1")]
    if not cfg.confidence_no_batchnorm:
        ents.append(_TorchBN1d(f"{rp}confidence_predictor.1", f"{op}confidence_bn1"))
    ents.append(_Linear(f"{rp}confidence_predictor.4", f"{op}confidence_mlp2"))
    if not cfg.confidence_no_batchnorm:
        ents.append(_TorchBN1d(f"{rp}confidence_predictor.5", f"{op}confidence_bn2"))
    ents.append(_Linear(f"{rp}confidence_predictor.8", f"{op}confidence_out"))
    return ents


def _encoder_entries(cfg: EncoderConfig, ref: str = "", ours: str = "") -> list:
    """TPEncoder (reference models/latent_encoder.py:16-170)."""
    if cfg.latent_virtual_nodes:
        raise NotImplementedError(
            "latent_virtual_nodes encoders (TransformerConv stack) are not "
            "supported by the importer; no shipped checkpoint uses them"
        )
    rp = (ref + ".") if ref else ""
    op = (ours + "/") if ours else ""
    ents = []
    # sigma_embed_dim = 0 and latent extras sized by input_latent_dim
    lig_dense = cfg.input_latent_dim > 0
    ents += _atom_encoder_entries(
        f"{rp}lig_node_embedding", f"{op}lig_node_embedding", N_LIG_FEATURES,
        has_dense=lig_dense,
    )
    ents += _atom_encoder_entries(
        f"{rp}rec_node_embedding", f"{op}rec_node_embedding", N_REC_FEATURES,
        has_dense=cfg.esm_embedding_dim > 0 or cfg.input_latent_dim > 0,
    )
    for name in ("lig_edge_embedding", "rec_edge_embedding", "cross_edge_embedding"):
        ents += _seq_embedding_entries(f"{rp}{name}", f"{op}{name}")
    seq = get_irrep_seq(cfg.ns, cfg.nv, cfg.use_second_order_repr)
    faster = cfg.sh_lmax == 1 and not cfg.use_second_order_repr
    for i in range(cfg.num_conv_layers):
        ents += _conv_entries(
            f"{rp}conv_layers.{i}", f"{op}conv{i}", seq[min(i, 3)], seq[min(i + 1, 3)],
            cfg.sh_lmax, faster, groups=4, fc_idx=(0, 4), batch_norm=cfg.batch_norm,
        )
    if cfg.latent_vocab > 1:
        ents += _predictor_entries(f"{rp}latent_predictor", f"{op}latent_predictor",
                                   cfg.latent_no_batchnorm)
    else:
        ents += _predictor_entries(f"{rp}latent_s_predictor", f"{op}latent_s_predictor",
                                   cfg.latent_no_batchnorm)
        ents += _predictor_entries(f"{rp}latent_r_predictor", f"{op}latent_r_predictor",
                                   cfg.latent_no_batchnorm)
    return ents


def _ar_entries(score_cfg: ScoreModelConfig, latent_no_batchnorm: bool = False) -> list:
    """PretrainedScoreEncoder (reference models/pretrained_score_encoder.py).

    The wrapped score model's state_dict includes its tr/rot/tor heads, but
    the AR forward only calls ``embed`` (:60); our AR module materializes the
    trunk only, so head keys are dropped (import_state_dict's droplist).
    """
    ents = _score_model_entries(score_cfg, ref="pretrained_score_model",
                                ours="pretrained_score_model")
    # strip head entries: keep only trunk (embeddings + conv layers + uncond)
    head_refs = ("pretrained_score_model.center_edge_embedding",
                 "pretrained_score_model.final_conv",
                 "pretrained_score_model.tr_final_layer",
                 "pretrained_score_model.rot_final_layer",
                 "pretrained_score_model.final_edge_embedding",
                 "pretrained_score_model.tor_bond_conv",
                 "pretrained_score_model.tor_final_layer",
                 "pretrained_score_model.confidence_predictor")
    def is_head(e):
        r = e.ref_fc if isinstance(e, _ConvFC) else e.ref
        return any(r.startswith(h) for h in head_refs)
    ents = [e for e in ents if not is_head(e)]
    ents += _predictor_entries("latent_s_predictor", "latent_s_predictor",
                               latent_no_batchnorm)
    ents += _predictor_entries("latent_r_predictor", "latent_r_predictor",
                               latent_no_batchnorm)
    return ents


AR_HEAD_DROP_PREFIXES = (
    "pretrained_score_model.center_edge_embedding.",
    "pretrained_score_model.final_conv.",
    "pretrained_score_model.tr_final_layer.",
    "pretrained_score_model.rot_final_layer.",
    "pretrained_score_model.final_edge_embedding.",
    "pretrained_score_model.tor_bond_conv.",
    "pretrained_score_model.tor_final_layer.",
    "pretrained_score_model.confidence_predictor.",
)


def _all_atom_entries(cfg: ScoreModelConfig) -> list:
    """All-atom TensorProductScoreModel (reference models/all_atom_score_model.py:53-200)."""
    assert cfg.all_atoms
    has_lm = cfg.esm_embedding_dim > 0
    old = cfg.use_old_atom_encoder
    ents = []
    ents += _atom_encoder_entries("lig_node_embedding", "lig_node_embedding",
                                  N_LIG_FEATURES, True, old=old)
    ents += _atom_encoder_entries("rec_node_embedding", "rec_node_embedding",
                                  N_REC_FEATURES, True, old=old, has_lm=has_lm)
    ents += _atom_encoder_entries("atom_node_embedding", "atom_node_embedding",
                                  N_ATOM_FEATURES, True, old=old)
    for name in ("lig_edge_embedding", "rec_edge_embedding", "atom_edge_embedding",
                 "lr_edge_embedding", "ar_edge_embedding", "la_edge_embedding"):
        ents += _seq_embedding_entries(name, name)
    seq = get_irrep_seq(cfg.ns, cfg.nv, cfg.use_second_order_repr)
    # all-atom irrep_seq always uses ns pseudoscalars (all_atom_score_model.py:117-130)
    for l in range(cfg.num_conv_layers):
        in_ir = seq[min(l, 3)]
        out_ir = seq[min(l + 1, 3)]
        # the reference constructs 9 convs per depth level but the last level
        # runs only the three ligand-side ones (all_atom_score_model.py:245,
        # "last layer optimisation"); the other six exist in its state_dict
        # with never-used weights -- dropped on import, absent from export
        n_used = 3 if l == cfg.num_conv_layers - 1 else 9
        for j in range(n_used):
            ents += _conv_entries(
                f"conv_layers.{9 * l + j}", f"conv{l}_{j}", in_ir, out_ir,
                cfg.sh_lmax, faster=False, groups=1, fc_idx=(0, 3),
                batch_norm=cfg.batch_norm,
            )
    trunk_out = seq[min(cfg.num_conv_layers, 3)]
    if cfg.confidence_mode:
        ents += _predictor_entries_confidence("", "", cfg)
    else:
        ents += _seq_embedding_entries("center_edge_embedding", "center_edge_embedding")
        ents += _conv_entries("final_conv", "final_conv", trunk_out, "2x1o + 2x1e",
                              cfg.sh_lmax, faster=False, groups=1, fc_idx=(0, 3),
                              batch_norm=cfg.batch_norm)
        ents += [
            _Linear("tr_final_layer.0", "tr_final_dense1"),
            _Linear("tr_final_layer.3", "tr_final_dense2"),
            _Linear("rot_final_layer.0", "rot_final_dense1"),
            _Linear("rot_final_layer.3", "rot_final_dense2"),
        ]
        if not cfg.no_torsion:
            ents += _seq_embedding_entries("final_edge_embedding", "final_edge_embedding")
            ents += _conv_entries("tor_bond_conv", "tor_bond_conv", trunk_out,
                                  f"{cfg.ns}x0o + {cfg.ns}x0e", cfg.sh_lmax,
                                  faster=False, groups=1, fc_idx=(0, 3), tor_ftp=True,
                                  batch_norm=cfg.batch_norm)
            ents += [
                _Linear("tor_final_layer.0", "tor_final_dense1", bias=False),
                _Linear("tor_final_layer.3", "tor_final_dense2", bias=False),
            ]
    return ents


def _entries_for(kind: str, score_cfg=None, enc_cfg=None, **kw) -> list:
    if kind == "score":
        return _score_model_entries(score_cfg, **kw)
    if kind == "wrapper":
        ents = _score_model_entries(score_cfg, ref="score_model", ours="score_model", **kw)
        if enc_cfg is not None:
            ents += _encoder_entries(enc_cfg, ref="encoder", ours="encoder")
        return ents
    if kind == "encoder":
        return _encoder_entries(enc_cfg)
    if kind == "ar":
        return _ar_entries(score_cfg, **kw)
    if kind == "all_atom":
        return _all_atom_entries(score_cfg, **kw)
    raise ValueError(f"unknown kind {kind!r}")


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def import_state_dict(
    sd: dict,
    kind: str,
    score_cfg: Optional[ScoreModelConfig] = None,
    enc_cfg: Optional[EncoderConfig] = None,
    strict: bool = True,
    **kw,
) -> dict:
    """reference state_dict -> flax variables {"params", "batch_stats"}.

    ``sd`` values may be torch tensors or numpy arrays; a leading
    ``module.`` (DataParallel, utils/model_utils.py:98) is stripped.
    ``strict``: raise if any reference key is neither consumed nor on the
    expected droplist (GaussianSmearing offsets, BN step counters, AR score
    -model head weights).
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    view = _SD(sd)
    params: dict = {}
    stats: dict = {}
    for e in _entries_for(kind, score_cfg=score_cfg, enc_cfg=enc_cfg, **kw):
        e.imp(view, params, stats)
    extra_drop = ()
    if kind == "ar":
        extra_drop = AR_HEAD_DROP_PREFIXES
    elif kind == "all_atom":
        base = 9 * (score_cfg.num_conv_layers - 1)
        extra_drop = tuple(f"conv_layers.{base + j}." for j in range(3, 9))
    left = view.leftovers(extra_drop)
    if strict and left:
        raise ValueError(f"unmapped reference keys ({len(left)}): {left[:10]} ...")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def export_state_dict(
    variables: dict,
    kind: str,
    score_cfg: Optional[ScoreModelConfig] = None,
    enc_cfg: Optional[EncoderConfig] = None,
    **kw,
) -> dict:
    """flax variables -> reference-shaped state_dict (numpy values).

    The exact inverse of :func:`import_state_dict` for every mapped weight;
    deterministic reference buffers (GaussianSmearing offsets) are not
    emitted -- the reference modules recreate them from hyperparameters.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    view = _SD({})
    for e in _entries_for(kind, score_cfg=score_cfg, enc_cfg=enc_cfg, **kw):
        e.exp(params, stats, view)
    return view.sd
