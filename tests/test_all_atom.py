"""All-atom score model tests (the confidence-model architecture)."""
import jax
import jax.numpy as jnp
import numpy as np

from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.models.all_atom_score_model import AllAtomScoreModel
from disco_diffdock_tpu.nn import cg


def aa_caps():
    return GraphCaps(
        max_lig=16, max_rec=24, lig_bond_cap=36, lig_radius_cap=128,
        rec_edge_cap=24 * 8, cross_cap=192, tor_cap=4, tor_edge_cap=64,
        max_atoms=96, atom_edge_cap=96 * 8, la_cap=128,
    )


def aa_cfg(**kw):
    base = dict(
        ns=8, nv=2, num_conv_layers=3, sh_lmax=2, dropout=0.0,
        esm_embedding_dim=16, latent_dim=0, latent_droprate=0.0, all_atoms=True,
    )
    base.update(kw)
    return ScoreModelConfig(**base)


def aa_batch(seed=0):
    return make_complex_batch(
        seed=seed, batch=2, n_lig=10, n_res=16, caps=aa_caps(), esm_dim=16,
        c_alpha_max_neighbors=8, all_atoms=True, atoms_per_res=4,
    )


def test_score_mode_shapes_and_equivariance():
    model = AllAtomScoreModel(cfg=aa_cfg(), caps=aa_caps())
    batch = aa_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    (tr, rot, tor), _ = model.apply(variables, batch, mutable=["batch_stats"])
    assert tr.shape == (2, 3) and rot.shape == (2, 3) and tor.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(tr)))

    R = cg._random_rotation(np.random.RandomState(3)).astype(np.float32)
    Rj = jnp.asarray(R)
    rb = batch.replace(
        lig_pos=batch.lig_pos @ Rj.T,
        rec_pos=batch.rec_pos @ Rj.T,
        atom_pos=batch.atom_pos @ Rj.T,
    )
    (tr_r, rot_r, tor_r), _ = model.apply(variables, rb, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(tr_r), np.asarray(tr) @ R.T, atol=3e-3)
    np.testing.assert_allclose(np.asarray(rot_r), np.asarray(rot) @ R.T, atol=3e-3)
    np.testing.assert_allclose(np.asarray(tor_r), np.asarray(tor), atol=3e-3)


def test_confidence_mode():
    model = AllAtomScoreModel(cfg=aa_cfg(confidence_mode=True), caps=aa_caps())
    batch = aa_batch().set_time(0.0, 0.0, 0.0)
    variables = model.init(jax.random.PRNGKey(0), batch)
    conf, _ = model.apply(variables, batch, mutable=["batch_stats"])
    assert conf.shape == (2,)
    assert np.all(np.isfinite(np.asarray(conf)))


def test_shared_rec_matches_full():
    """Pose-shared receptor/atom fast path (the confidence-reranking batch
    shape) must reproduce the plain forward exactly."""
    model = AllAtomScoreModel(cfg=aa_cfg(confidence_mode=True), caps=aa_caps())
    batch = make_complex_batch(
        seed=4, batch=5, n_lig=10, n_res=16, caps=aa_caps(), esm_dim=16,
        c_alpha_max_neighbors=8, all_atoms=True, atoms_per_res=4,
        same_complex=True,
    )
    key = jax.random.PRNGKey(9)
    batch = batch.replace(
        lig_pos=batch.lig_pos + jax.random.normal(key, batch.lig_pos.shape) * 0.5
    ).set_time(0.0, 0.0, 0.0)
    variables = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(variables, batch, deterministic=True,
                      use_running_average=True)
    fast = model.apply(variables, batch, deterministic=True,
                       use_running_average=True, shared_rec=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_multiclass_confidence():
    model = AllAtomScoreModel(
        cfg=aa_cfg(confidence_mode=True, num_confidence_outputs=3), caps=aa_caps()
    )
    batch = aa_batch().set_time(0.0, 0.0, 0.0)
    variables = model.init(jax.random.PRNGKey(0), batch)
    conf, _ = model.apply(variables, batch, mutable=["batch_stats"])
    assert conf.shape == (2, 3)
