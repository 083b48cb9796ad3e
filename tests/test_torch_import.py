"""Checkpoint-importer tests (interop/torch_import.py, interop/tp_layout.py).

Two layers of evidence:
  1. **Independent e3nn-semantics oracles**: plain-numpy implementations of
     ``o3.FullyConnectedTensorProduct`` (instruction order, path
     normalization sqrt(d_out / fan), wigner_3j from interop/e3nn_basis) and
     ``o3.FullTensorProduct`` (sorted outputs, sqrt(d_out) scaling).  The
     weight transforms must make our WeightedTensorProduct reproduce those
     oracles through the per-l basis transport T_l (fit numerically from the
     two SH bases).
  2. **Round-trips**: export_state_dict o import_state_dict is the identity
     on every model family's full variable tree, and import consumes exactly
     the reference key set (strict mode).
"""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from disco_diffdock_tpu.config import EncoderConfig, GraphCaps, ScoreModelConfig
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.interop.e3nn_basis import sh_e3nn, wigner_3j
from disco_diffdock_tpu.interop.tp_layout import (
    fctp_weight_transform,
    full_tp_block_map,
)
from disco_diffdock_tpu.interop.torch_import import (
    export_state_dict,
    import_state_dict,
)
from disco_diffdock_tpu.nn.irreps import Irreps
from disco_diffdock_tpu.nn.sh import sh_numpy
from disco_diffdock_tpu.nn.tensor_product import FullTensorProduct, WeightedTensorProduct


# ---------------------------------------------------------------------------
# numpy oracles of e3nn semantics
# ---------------------------------------------------------------------------

def _blocks(irreps):
    return [(mi.mul, mi.ir.l, mi.ir.p) for mi in Irreps(irreps)]


def fctp_e3nn(in_irreps, sh_irreps, out_irreps, x, sh, w_flat):
    """o3.FullyConnectedTensorProduct(shared_weights=False) forward.

    Instructions in (i_in, i_sh, i_out) order; each weight block
    (mul_in, 1, mul_out) row-major; per-path scale sqrt(d_out / fan) with
    fan = total weighted elements feeding i_out ('component' irrep
    normalization, 'element' path normalization).
    """
    inb, shb, outb = _blocks(in_irreps), _blocks(sh_irreps), _blocks(out_irreps)

    def compat(b1, b2, b3):
        _, l1, p1 = b1
        _, l2, p2 = b2
        _, l3, p3 = b3
        return p1 * p2 == p3 and abs(l1 - l2) <= l3 <= l1 + l2

    instrs = [
        (i1, i2, i3)
        for i1, b1 in enumerate(inb)
        for i2, b2 in enumerate(shb)
        for i3, b3 in enumerate(outb)
        if compat(b1, b2, b3)
    ]
    fan = {i3: sum(inb[i1][0] for (i1, _, j3) in instrs if j3 == i3) for i3 in range(len(outb))}

    def sl(blocks, i):
        start = sum(m * (2 * l + 1) for m, l, _ in blocks[:i])
        m, l, _ = blocks[i]
        return slice(start, start + m * (2 * l + 1))

    out = np.zeros(x.shape[:-1] + (sum(m * (2 * l + 1) for m, l, _ in outb),))
    ofs = 0
    for (i1, i2, i3) in instrs:
        m1, l1, _ = inb[i1]
        _, l2, _ = shb[i2]
        m3, l3, _ = outb[i3]
        W = w_flat[..., ofs : ofs + m1 * m3].reshape(w_flat.shape[:-1] + (m1, m3))
        ofs += m1 * m3
        C = wigner_3j(l1, l2, l3)
        xb = x[..., sl(inb, i1)].reshape(x.shape[:-1] + (m1, 2 * l1 + 1))
        shv = sh[..., sl(shb, i2)]
        alpha = np.sqrt((2 * l3 + 1) / fan[i3])
        contrib = alpha * np.einsum("ijk,...ui,...j,...uw->...wk", C, xb, shv, W)
        out[..., sl(outb, i3)] += contrib.reshape(contrib.shape[:-2] + (-1,))
    assert ofs == w_flat.shape[-1]
    return out


def ftp_e3nn(irreps1, irreps2, x1, x2, lmax_keep=100):
    """o3.FullTensorProduct forward: all paths, per-path scale sqrt(d_out),
    output blocks SORTED by e3nn's canonical irrep order (stable)."""
    b1, b2 = _blocks(irreps1), _blocks(irreps2)
    gen = []
    for i1, (m1, l1, p1) in enumerate(b1):
        for i2, (m2, l2, p2) in enumerate(b2):
            assert m2 == 1
            for l3 in range(abs(l1 - l2), l1 + l2 + 1):
                gen.append((i1, i2, l3, p1 * p2))
    order = sorted(range(len(gen)), key=lambda g: (gen[g][2], -gen[g][3] * (-1) ** gen[g][2]))

    def sl(blocks, i):
        start = sum(m * (2 * l + 1) for m, l, _ in blocks[:i])
        m, l, _ = blocks[i]
        return slice(start, start + m * (2 * l + 1))

    outs = []
    for g in order:
        i1, i2, l3, _ = gen[g]
        m1, l1, _ = b1[i1]
        _, l2, _ = b2[i2]
        if l3 > 3:
            # beyond our CG tables; these blocks can never reach any shipped
            # model's outputs (no in-irrep has l matching them) -- emit zeros
            # so the sorted slice offsets stay correct
            outs.append((l3, np.zeros(x1.shape[:-1] + (m1 * (2 * l3 + 1),))))
            continue
        C = wigner_3j(l1, l2, l3)
        xb = x1[..., sl(b1, i1)].reshape(x1.shape[:-1] + (m1, 2 * l1 + 1))
        yb = x2[..., sl(b2, i2)]
        o = np.sqrt(2 * l3 + 1) * np.einsum("ijk,...ui,...j->...uk", C, xb, yb)
        outs.append((l3, o.reshape(o.shape[:-2] + (-1,))))
    kept = [o for l3, o in outs if l3 <= lmax_keep]
    return np.concatenate(kept, -1), [l3 for l3, _ in outs]


# ---------------------------------------------------------------------------
# basis transport between e3nn's SH basis and ours
# ---------------------------------------------------------------------------

def transport(l: int) -> np.ndarray:
    """T_l with sh_ours(v) = T_l @ sh_e3nn(v) for all v (both orthonormal
    real SH bases of the same function space -> constant orthogonal)."""
    rng = np.random.RandomState(3 + l)
    pts = rng.randn(6 * (2 * l + 1), 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    lo = l * l
    A = sh_e3nn(pts, l)[:, lo:]
    B = sh_numpy(pts, l)[:, lo:]
    T, _, _, _ = np.linalg.lstsq(A, B, rcond=None)
    T = T.T
    assert np.abs(T @ A.T - B.T).max() < 1e-9
    assert np.abs(T @ T.T - np.eye(2 * l + 1)).max() < 1e-9
    return T


def transport_features(irreps, x_e3nn: np.ndarray) -> np.ndarray:
    """Blockwise T_l applied to concatenated irreps features."""
    out = np.zeros_like(x_e3nn)
    for mi, sl_ in zip(Irreps(irreps), Irreps(irreps).slices()):
        b = x_e3nn[..., sl_].reshape(x_e3nn.shape[:-1] + (mi.mul, mi.ir.dim))
        b = np.einsum("kj,...uj->...uk", transport(mi.ir.l), b)
        out[..., sl_] = b.reshape(x_e3nn.shape[:-1] + (mi.mul * mi.ir.dim,))
    return out


CASES = [
    # (in, sh_lmax, out) -- lmax=1 family, l=2 sh, second-order reps
    ("4x0e + 2x1o + 2x1e + 4x0o", 1, "4x0e + 2x1o + 2x1e + 4x0o"),
    ("4x0e + 2x1o", 1, "4x0e + 2x1o + 2x1e"),
    ("4x0e + 2x1o + 2x1e + 4x0o", 1, "2x1o + 2x1e"),
    ("4x0e + 2x1o + 2x1e + 4x0o", 2, "4x0e + 2x1o + 2x1e + 4x0o"),
    ("3x0e + 2x1o + 2x2e + 2x1e + 2x2o + 3x0o", 2,
     "3x0e + 2x1o + 2x2e + 2x1e + 2x2o + 3x0o"),
    ("4x0e + 2x1o + 2x1e + 4x0o", 2, "2x1o + 2x1e"),
]


@pytest.mark.parametrize("case", CASES)
def test_fctp_transform_matches_e3nn_oracle(case):
    in_ir, sh_lmax, out_ir = case
    sh_ir = " + ".join(["1x0e"] + [f"1x{l}{'eo'[l % 2]}" for l in range(1, sh_lmax + 1)])
    rng = np.random.RandomState(0)
    E = 7
    x_ref = rng.randn(E, Irreps(in_ir).dim)
    v = rng.randn(E, 3)
    sh_ref = sh_e3nn(v, sh_lmax)
    sh_ours = sh_numpy(v, sh_lmax)
    perm, signs = fctp_weight_transform(in_ir, sh_ir, out_ir)
    w_ref = rng.randn(E, len(perm))
    ref_out = fctp_e3nn(in_ir, sh_ir, out_ir, x_ref, sh_ref, w_ref)

    wtp = WeightedTensorProduct(in_ir, sh_ir, out_ir)
    w_ours = w_ref[:, perm] * signs
    ours_out = np.asarray(
        wtp(jnp.asarray(transport_features(in_ir, x_ref)), jnp.asarray(sh_ours),
            jnp.asarray(w_ours))
    )
    np.testing.assert_allclose(
        ours_out, transport_features(out_ir, ref_out), atol=1e-5
    )


@pytest.mark.parametrize("sh_lmax", [1, 2])
def test_full_tp_matches_e3nn_oracle(sh_lmax):
    """Our FullTensorProduct block values = sign * transported e3nn blocks,
    with full_tp_block_map giving the position/sign correspondence."""
    sh_ir = " + ".join(["1x0e"] + [f"1x{l}{'eo'[l % 2]}" for l in range(1, sh_lmax + 1)])
    rng = np.random.RandomState(1)
    v1, v2 = rng.randn(5, 3), rng.randn(5, 3)
    x1_ref, x2_ref = sh_e3nn(v1, sh_lmax), sh_e3nn(v2, 2)[:, 4:]
    x1_ours, x2_ours = sh_numpy(v1, sh_lmax), sh_numpy(v2, 2)[:, 4:]

    ref_out, _ = ftp_e3nn(sh_ir, "1x2e", x1_ref, x2_ref)
    ftp = FullTensorProduct(sh_ir, "1x2e")
    ours_out = np.asarray(ftp(jnp.asarray(x1_ours), jnp.asarray(x2_ours)))

    info = full_tp_block_map(sh_ir, "1x2e")
    # e3nn sorted block slices
    e3nn_slices, start = [], 0
    for (m, l, p) in info.e3nn_irreps:
        e3nn_slices.append(slice(start, start + m * (2 * l + 1)))
        start += m * (2 * l + 1)
    assert start == ref_out.shape[-1]
    for b, sl_ in zip(ftp.irreps_out, Irreps(str(ftp.irreps_out)).slices()):
        pass
    ours_slices = Irreps(str(ftp.irreps_out)).slices()
    for ours_b, (e3nn_pos, sign) in enumerate(zip(info.ours_to_e3nn, info.block_signs)):
        mi = ftp.irreps_out[ours_b]
        got = ours_out[..., ours_slices[ours_b]]
        ref_b = ref_out[..., e3nn_slices[e3nn_pos]]
        ref_b = ref_b.reshape(ref_b.shape[:-1] + (mi.mul, mi.ir.dim))
        ref_b = np.einsum("kj,...uj->...uk", transport(mi.ir.l), ref_b)
        ref_b = sign * ref_b.reshape(got.shape)
        np.testing.assert_allclose(got, ref_b, atol=1e-6)


def test_tor_conv_transform_matches_oracle():
    """End-to-end torsion-head weight path: e3nn FCTP whose sh input is the
    e3nn FullTensorProduct (sorted blocks) vs our WTP on our FTP."""
    for sh_lmax in (1, 2):
        sh_ir = " + ".join(["1x0e"] + [f"1x{l}{'eo'[l % 2]}" for l in range(1, sh_lmax + 1)])
        in_ir = "4x0e + 2x1o + 2x1e + 4x0o"
        out_ir = "4x0o + 4x0e"
        rng = np.random.RandomState(2)
        E = 6
        v1, v2 = rng.randn(E, 3), rng.randn(E, 3)
        x_ref = rng.randn(E, Irreps(in_ir).dim)

        ftp_sh_ref, _ = ftp_e3nn(sh_ir, "1x2e", sh_e3nn(v1, sh_lmax), sh_e3nn(v2, 2)[:, 4:])
        info = full_tp_block_map(sh_ir, "1x2e")
        ftp = FullTensorProduct(sh_ir, "1x2e")
        ours_sh_blocks = [(mi.mul, mi.ir.l, mi.ir.p) for mi in ftp.irreps_out]
        perm, signs = fctp_weight_transform(
            in_ir, ours_sh_blocks, out_ir,
            sh_irreps_e3nn=info.e3nn_irreps,
            sh_block_map=info.ours_to_e3nn,
            sh_block_signs=info.block_signs,
        )
        w_ref = rng.randn(E, len(perm))
        ref_out = fctp_e3nn(
            in_ir,
            [(m, l, p) for (m, l, p) in info.e3nn_irreps],
            out_ir, x_ref, ftp_sh_ref, w_ref,
        )

        ftp_sh_ours = np.asarray(
            ftp(jnp.asarray(sh_numpy(v1, sh_lmax)), jnp.asarray(sh_numpy(v2, 2)[:, 4:]))
        )
        wtp = WeightedTensorProduct(in_ir, str(ftp.irreps_out), out_ir)
        ours_out = np.asarray(
            wtp(jnp.asarray(transport_features(in_ir, x_ref)),
                jnp.asarray(ftp_sh_ours), jnp.asarray(w_ref[:, perm] * signs))
        )
        np.testing.assert_allclose(
            ours_out, transport_features(out_ir, ref_out), atol=1e-5
        )


# ---------------------------------------------------------------------------
# model-family round-trips
# ---------------------------------------------------------------------------

CAPS = GraphCaps(
    max_lig=12, max_rec=16, lig_bond_cap=30, lig_radius_cap=12 * 11,
    rec_edge_cap=16 * 8, cross_cap=12 * 16, tor_cap=4, tor_edge_cap=4 * 12,
    max_atoms=24, atom_edge_cap=24 * 6, la_cap=48,
)


def _batch():
    return make_complex_batch(
        seed=3, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
        c_alpha_max_neighbors=6,
    )


def _randomized(variables, seed=5):
    rng = np.random.RandomState(seed)

    def rnd(path, leaf):
        x = rng.randn(*leaf.shape).astype(np.float32)
        if "var" in jax.tree_util.keystr(path):
            x = np.abs(x) + 1.0
        return np.asarray(x)

    return jax.tree_util.tree_map_with_path(rnd, variables)


def _assert_roundtrip(variables, kind, **kw):
    sd = export_state_dict(variables, kind, **kw)
    back = import_state_dict(sd, kind, **kw)
    flat1 = {jax.tree_util.keystr(p): l
             for p, l in jax.tree_util.tree_flatten_with_path(variables)[0]}
    flat2 = {jax.tree_util.keystr(p): l
             for p, l in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert set(flat1) == set(flat2), (
        set(flat1) ^ set(flat2)
    )
    for k in flat1:
        np.testing.assert_array_equal(np.asarray(flat1[k]), np.asarray(flat2[k]), err_msg=k)
    return sd


def test_roundtrip_score_model():
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel

    cfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=5, esm_embedding_dim=6,
                           dropout=0.0, latent_dim=2, latent_vocab=1, latent_droprate=0.1)
    m = TensorProductScoreModel(cfg=cfg, caps=CAPS)
    lat = (jnp.zeros((2, 12, 2)), jnp.zeros((2, 16, 2)))
    v = _randomized(m.init(jax.random.PRNGKey(0), _batch(), latent=lat,
                           unconditional=jnp.zeros((2, 1))))
    sd = _assert_roundtrip(v, "score", score_cfg=cfg)
    # spot-check reference naming
    assert "conv_layers.0.fc.3.0.weight" in sd
    assert "final_conv.fc.4.weight" in sd
    assert "tor_bond_conv.batch_norm.running_var" in sd
    assert "lig_node_embedding.atom_embedding_list.15.weight" in sd
    assert "rec_node_unconditional_embedding" in sd
    assert "tor_final_layer.0.weight" in sd and "tor_final_layer.0.bias" not in sd


def test_roundtrip_score_model_sh2_and_confidence():
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel

    cfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=2, sh_lmax=2,
                           esm_embedding_dim=6, dropout=0.0, latent_dim=0,
                           latent_droprate=0.0)
    m = TensorProductScoreModel(cfg=cfg, caps=CAPS)
    v = _randomized(m.init(jax.random.PRNGKey(0), _batch()))
    _assert_roundtrip(v, "score", score_cfg=cfg)

    cfg_c = ScoreModelConfig(ns=4, nv=2, num_conv_layers=3, esm_embedding_dim=6,
                             dropout=0.0, latent_dim=0, latent_droprate=0.0,
                             confidence_mode=True)
    m = TensorProductScoreModel(cfg=cfg_c, caps=CAPS)
    b = _batch()
    v = _randomized(m.init(jax.random.PRNGKey(0), b))
    sd = _assert_roundtrip(v, "score", score_cfg=cfg_c)
    assert "confidence_predictor.8.weight" in sd


def test_roundtrip_wrapper_and_encoder():
    from disco_diffdock_tpu.models.wrapper import ModelWrapper

    scfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=5, esm_embedding_dim=6,
                            dropout=0.0, latent_dim=2, latent_vocab=1, latent_droprate=0.1)
    ecfg = EncoderConfig(ns=4, nv=2, num_conv_layers=3, esm_embedding_dim=6,
                         dropout=0.0, latent_dim=2, latent_vocab=1)
    m = ModelWrapper(score_cfg=scfg, encoder_cfg=ecfg, caps=CAPS,
                     training_latent_temperature=1.0, latent_droprate=0.1)
    v = m.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
                "droprate": jax.random.PRNGKey(2)}, _batch())
    v = _randomized(v)
    sd = _assert_roundtrip(v, "wrapper", score_cfg=scfg, enc_cfg=ecfg)
    assert "encoder.latent_s_predictor.0.weight" in sd
    assert "encoder.latent_s_predictor.1.running_mean" in sd
    assert "score_model.conv_layers.4.fc.0.4.bias" in sd
    # DataParallel prefix stripping
    sd_dp = {f"module.{k}": val for k, val in sd.items()}
    back = import_state_dict(sd_dp, "wrapper", score_cfg=scfg, enc_cfg=ecfg)
    assert "encoder" in back["params"]


def test_roundtrip_ar():
    from disco_diffdock_tpu.models.ar import PretrainedScoreEncoder

    scfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=2, sh_lmax=2,
                            esm_embedding_dim=6, dropout=0.0, latent_dim=2,
                            latent_vocab=1, latent_droprate=0.1)
    m = PretrainedScoreEncoder(score_cfg=scfg, caps=CAPS, latent_dim=1,
                               input_latent_dim=2)
    lat = (jnp.zeros((2, 12, 2)), jnp.zeros((2, 16, 2)))
    v = _randomized(m.init(jax.random.PRNGKey(0), _batch(), lat,
                           jnp.zeros((2,), jnp.int32)))
    sd = _assert_roundtrip(v, "ar", score_cfg=scfg)
    assert "pretrained_score_model.conv_layers.1.fc.2.0.weight" in sd
    # reference AR checkpoints carry the score model's (unused) head weights;
    # the importer must drop them silently
    sd2 = dict(sd)
    sd2["pretrained_score_model.final_conv.fc.0.weight"] = np.zeros((1, 1), np.float32)
    import_state_dict(sd2, "ar", score_cfg=scfg)


def test_roundtrip_ar_ns_quirk():
    """Reference quirk (pretrained_score_encoder.py:15,63-66): the AR model's
    own ns (shipped: 16) slices the score trunk's wider scalars (shipped: 24).
    The predictor input is 2*ar_ns, not 2*score_ns."""
    from disco_diffdock_tpu.models.ar import PretrainedScoreEncoder

    scfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=3, sh_lmax=1,
                            esm_embedding_dim=6, dropout=0.0, latent_dim=2,
                            latent_vocab=1, latent_droprate=0.1)
    m = PretrainedScoreEncoder(score_cfg=scfg, caps=CAPS, latent_dim=1,
                               input_latent_dim=2, ns=3)
    lat = (jnp.zeros((2, 12, 2)), jnp.zeros((2, 16, 2)))
    v = m.init(jax.random.PRNGKey(0), _batch(), lat, jnp.zeros((2,), jnp.int32))
    k = v["params"]["latent_s_predictor"]["Dense_0"]["kernel"]
    assert k.shape[0] == 2 * 3  # 2*ar_ns, not 2*score_ns
    v = _randomized(v)
    _assert_roundtrip(v, "ar", score_cfg=scfg)


def test_roundtrip_all_atom_confidence():
    from disco_diffdock_tpu.models.all_atom_score_model import AllAtomScoreModel

    cfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=3, sh_lmax=2, dropout=0.0,
                           esm_embedding_dim=6, latent_dim=0, latent_droprate=0.0,
                           all_atoms=True, confidence_mode=True)
    m = AllAtomScoreModel(cfg=cfg, caps=CAPS)
    b = make_complex_batch(seed=3, batch=2, n_lig=10, n_res=14, caps=CAPS,
                           esm_dim=6, c_alpha_max_neighbors=6, all_atoms=True,
                           atoms_per_res=1)
    v = _randomized(m.init(jax.random.PRNGKey(0), b))
    sd = _assert_roundtrip(v, "all_atom", score_cfg=cfg)
    # all-atom conv fc is a plain Sequential: Linear at indices 0 and 3
    assert "conv_layers.20.fc.3.weight" in sd  # 9*2+2: last-layer la conv
    assert "conv_layers.17.fc.3.weight" in sd  # 9*1+8: middle layers keep all 9
    # the reference's unused last-layer convs (9*2+3..8) import as drops
    sd2 = dict(sd)
    sd2["conv_layers.26.fc.3.weight"] = np.zeros((1, 1), np.float32)
    import_state_dict(sd2, "all_atom", score_cfg=cfg)
    assert "atom_node_embedding.atom_embedding_list.3.weight" in sd


def test_roundtrip_all_atom_old_encoder():
    """The shipped paper_confidence_model predates use_old_atom_encoder, which
    the reference then defaults to True (model_utils.py:62): OldAtomEncoder
    with its scalar linear + late ESM fusion (models/layers.py:81-116)."""
    from disco_diffdock_tpu.models.all_atom_score_model import AllAtomScoreModel

    cfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=2, sh_lmax=2, dropout=0.0,
                           esm_embedding_dim=6, latent_dim=0, latent_droprate=0.0,
                           all_atoms=True, confidence_mode=True,
                           use_old_atom_encoder=True)
    m = AllAtomScoreModel(cfg=cfg, caps=CAPS)
    b = make_complex_batch(seed=3, batch=2, n_lig=10, n_res=14, caps=CAPS,
                           esm_dim=6, c_alpha_max_neighbors=6, all_atoms=True,
                           atoms_per_res=1)
    v = _randomized(m.init(jax.random.PRNGKey(0), b))
    sd = _assert_roundtrip(v, "all_atom", score_cfg=cfg)
    assert "rec_node_embedding.linear.weight" in sd
    assert "rec_node_embedding.lm_embedding_layer.weight" in sd
    assert "lig_node_embedding.linear.weight" in sd
    assert "lig_node_embedding.additional_features_embedder.weight" not in sd


def test_import_cli_end_to_end(tmp_path):
    """scripts/import_reference_checkpoint.py: a reference-shaped .pt +
    reference-style yml becomes a run dir that build_score_runtime loads and
    runs, with outputs identical to the source parameters'."""
    import torch

    from disco_diffdock_tpu.models.wrapper import ModelWrapper
    sys_path_root = __import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__)))
    import sys
    sys.path.insert(0, str(sys_path_root) + "/scripts")
    import import_reference_checkpoint as cli

    scfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=5, sh_lmax=1,
                            esm_embedding_dim=6, dropout=0.0, latent_dim=2,
                            latent_vocab=1, latent_droprate=0.1)
    ecfg = EncoderConfig(ns=4, nv=2, num_conv_layers=3, sh_lmax=1,
                         esm_embedding_dim=6, dropout=0.0, latent_dim=2,
                         latent_vocab=1)
    m = ModelWrapper(score_cfg=scfg, encoder_cfg=ecfg, caps=CAPS,
                     training_latent_temperature=1.0, latent_droprate=0.1)
    batch = _batch()
    v = _randomized(m.init({"params": jax.random.PRNGKey(0),
                            "gumbel": jax.random.PRNGKey(1),
                            "droprate": jax.random.PRNGKey(2)}, batch))
    sd = export_state_dict(v, "wrapper", score_cfg=scfg, enc_cfg=ecfg)
    # save like the reference does (DataParallel prefixes included)
    ckpt = tmp_path / "best_ema_model.pt"
    torch.save({f"module.{k}": torch.from_numpy(np.asarray(val))
                for k, val in sd.items()}, ckpt)
    ref_yml = {
        "ns": 4, "nv": 2, "num_conv_layers": 5, "sh_lmax": 1,
        "use_second_order_repr": False, "no_batch_norm": False, "dropout": 0.0,
        "max_radius": 5.0, "cross_max_distance": 80, "dynamic_max_cross": True,
        "latent_dim": 2, "latent_vocab": 1, "latent_droprate": 0.1,
        "latent_cross_attention": False, "new_cross_attention": False,
        "encoder_ns": 4, "encoder_nv": 2, "encoder_num_conv_layers": 3,
        "encoder_cross_max_distance": 30, "encoder_no_esm": False,
        "esm_embeddings_path": "data/esm.pt", "embedding_type": "sinusoidal",
        "embedding_scale": 1000, "use_old_atom_encoder": False,
        "scale_by_sigma": True, "no_torsion": False,
    }
    with open(tmp_path / "model_parameters.yml", "w") as f:
        import yaml
        yaml.safe_dump(ref_yml, f)
    out_dir = tmp_path / "imported"
    cli.main(["--checkpoint", str(ckpt), "--out_dir", str(out_dir)])

    from disco_diffdock_tpu.train.loading import build_score_runtime, load_run_configs

    score_cfg2, enc_cfg2, _ = load_run_configs(str(out_dir))
    assert score_cfg2.ns == 4 and score_cfg2.esm_embedding_dim == 6
    assert enc_cfg2 is not None and enc_cfg2.cross_max_distance == 30
    view, variables, latent_fn, _, _ = build_score_runtime(str(out_dir), CAPS)
    lat = latent_fn(batch, jax.random.PRNGKey(7))
    out = view.apply(variables, batch, latent=lat,
                     unconditional=jnp.zeros((2, 1)))
    # identical to running the source parameter tree directly
    ref_out = m.apply(
        v, batch,
        method=lambda mm, bb: mm.score_model(
            bb, latent=lat, unconditional=jnp.zeros((2, 1)),
            deterministic=True, use_running_average=True),
    )
    for a, b in zip(out, ref_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_export_cli_roundtrip(tmp_path):
    """scripts/export_to_reference.py o scripts/import_reference_checkpoint.py
    is the identity on a wrapper run dir: framework -> reference .pt + yml ->
    framework, params bit-equal."""
    import sys

    root = __import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__)))
    sys.path.insert(0, root + "/scripts")
    import export_to_reference as exp_cli
    import import_reference_checkpoint as imp_cli

    from disco_diffdock_tpu.models.wrapper import ModelWrapper

    scfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=5, sh_lmax=1,
                            esm_embedding_dim=6, dropout=0.0, latent_dim=2,
                            latent_vocab=1, latent_droprate=0.1,
                            confidence_mode=False)
    ecfg = EncoderConfig(ns=4, nv=2, num_conv_layers=3, sh_lmax=1,
                         esm_embedding_dim=6, dropout=0.0, latent_dim=2,
                         latent_vocab=1, cross_max_distance=30.0)
    m = ModelWrapper(score_cfg=scfg, encoder_cfg=ecfg, caps=CAPS,
                     training_latent_temperature=1.0, latent_droprate=0.1)
    v = _randomized(m.init({"params": jax.random.PRNGKey(0),
                            "gumbel": jax.random.PRNGKey(1),
                            "droprate": jax.random.PRNGKey(2)}, _batch()))
    run_dir = tmp_path / "run"
    imp_cli.save_run_dir(str(run_dir), v,
                         dict(score_model=scfg, encoder=ecfg))

    out = tmp_path / "exported"
    exp_cli.main(["--run_dir", str(run_dir), "--out_dir", str(out)])
    assert (out / "best_ema_model.pt").exists()

    back = tmp_path / "reimported"
    imp_cli.main(["--checkpoint", str(out / "best_ema_model.pt"),
                  "--out_dir", str(back)])

    from disco_diffdock_tpu.train.loading import load_run_configs, restore_variables

    scfg2, ecfg2, _ = load_run_configs(str(back))
    assert scfg2 == scfg
    assert ecfg2 == ecfg
    v2 = restore_variables(str(back), "best", use_ema=False)
    flat1 = jax.tree_util.tree_leaves_with_path(v["params"])
    flat2 = jax.tree_util.tree_leaves_with_path(v2["params"])
    assert len(flat1) == len(flat2)
    for (p1, a1), (p2, a2) in zip(sorted(flat1, key=lambda t: str(t[0])),
                                  sorted(flat2, key=lambda t: str(t[0]))):
        assert str(p1) == str(p2)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2),
                                      err_msg=str(p1))


def test_strict_mode_flags_unknown_keys():
    cfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=2, esm_embedding_dim=6,
                           dropout=0.0, latent_dim=0, latent_droprate=0.0)
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel

    m = TensorProductScoreModel(cfg=cfg, caps=CAPS)
    v = _randomized(m.init(jax.random.PRNGKey(0), _batch()))
    sd = export_state_dict(v, "score", score_cfg=cfg)
    sd["mystery.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        import_state_dict(sd, "score", score_cfg=cfg)
    # GaussianSmearing buffers are expected and dropped
    sd.pop("mystery.weight")
    sd["lig_distance_expansion.offset"] = np.linspace(0, 5, 32).astype(np.float32)
    import_state_dict(sd, "score", score_cfg=cfg)
