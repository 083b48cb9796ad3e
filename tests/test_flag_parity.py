"""Reference-flag-surface tests: the CLIs expose the reference's knobs and
wire them to real behavior (utils/parsing.py, evaluate.py:27-78,
confidence_train.py, train_ar.py parsers)."""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
import pytest


def test_eval_scalar_temp_flags_override_triples():
    from disco_diffdock_tpu.eval.evaluate import parse_args

    args = parse_args([
        "--temp_sampling", "2.0", "3.0", "4.0",
        "--temp_sampling_rot", "7.5", "--temp_psi_tor", "0.9",
    ])
    assert args.temp_sampling == [2.0, 7.5, 4.0]
    assert args.temp_psi == [0.0, 0.0, 0.9]
    assert args.temp_sigma_data == [0.5, 0.5, 0.5]


def test_eval_log_softmax_latent_temperature():
    from disco_diffdock_tpu.eval.evaluate import parse_args

    args = parse_args(["--log_softmax_latent_temperature", "-1.5"])
    np.testing.assert_allclose(args.softmax_latent_temperature, 10 ** -1.5)


def test_actual_steps_truncates_schedule():
    """actual_steps truncation: the LAST EXECUTED step integrates the FULL
    remaining time to t=0 (reference utils/sampling.py:107-110 -- on the
    final loop iteration dt = schedule[t_idx], i.e. all of t itself), so the
    executed dts always sum to t[0].  Tests the sampler's own helper, not a
    local re-derivation."""
    from disco_diffdock_tpu.geom.diffusion import get_t_schedule
    from disco_diffdock_tpu.sampling.sampler import schedule_with_dt

    grid = np.asarray(get_t_schedule(5), np.float32)
    t_full, dt_full = schedule_with_dt(grid)
    assert len(t_full) == 5
    np.testing.assert_allclose(dt_full[-1], t_full[-1])  # jump to t=0
    np.testing.assert_allclose(dt_full.sum(), t_full[0], rtol=1e-6)

    t2, dt2 = schedule_with_dt(grid, actual_steps=3)
    assert len(t2) == 3
    # NOT the grid increment t[2]-t[3]: the truncated run still lands on t=0
    np.testing.assert_allclose(dt2[-1], grid[2])
    np.testing.assert_allclose(dt2.sum(), t2[0], rtol=1e-6)
    # actual_steps >= len(grid) is a no-op
    t3, dt3 = schedule_with_dt(grid, actual_steps=5)
    np.testing.assert_allclose(dt3, dt_full)


def test_train_score_sigma_and_weight_flags():
    """--tr_sigma_max etc. build the SigmaSchedule; loss weights reach the
    loss (weights (1,0,0) ≡ pure translation loss)."""
    from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
    from disco_diffdock_tpu.train.losses import score_matching_loss

    s = SigmaSchedule(tr_sigma_max=30.0, rot_sigma_min=0.1)
    assert s.tr_sigma_max == 30.0 and s.rot_sigma_min == 0.1

    B, R = 2, 3
    preds = (jnp.ones((B, 3)), jnp.zeros((B, 3)), jnp.zeros((B, R)))
    targets = {
        "tr_score": jnp.zeros((B, 3)), "rot_score": jnp.zeros((B, 3)) + 0.1,
        "tor_score": jnp.zeros((B, R)), "tor_sigma": jnp.ones((B,)),
    }

    class _B:
        graph_mask = jnp.ones((B,), bool)
        tor_mask = jnp.ones((B, R), bool)

    tr_s = rot_s = jnp.ones((B,))
    l_all, _ = score_matching_loss(preds, targets, _B, tr_s, rot_s,
                                   0.33, 0.33, 0.33)
    l_tr, _ = score_matching_loss(preds, targets, _B, tr_s, rot_s,
                                  1.0, 0.0, 0.0)
    assert not np.isclose(float(l_all), float(l_tr))


def test_plateau_lr_through_multisteps():
    """get/set_learning_rate reach inside optax.MultiSteps (gradient
    accumulation, reference train_ar.py:55)."""
    from disco_diffdock_tpu.train.plateau import (
        get_learning_rate, make_adam, set_learning_rate,
    )

    tx = optax.MultiSteps(make_adam(1e-3), 2)
    params = {"w": jnp.zeros((3,))}
    st = tx.init(params)
    assert np.isclose(get_learning_rate(st), 1e-3)
    st2 = set_learning_rate(st, 7e-4)
    assert np.isclose(get_learning_rate(st2), 7e-4)
    # the updated state still drives the optimizer
    g = {"w": jnp.ones((3,))}
    _, st3 = tx.update(g, st2, params)
    assert np.isclose(get_learning_rate(st3), 7e-4)


def test_ar_label_modes():
    """no_sampling -> softmax target vectors; sampling -> argmax one-hots
    with raw-logit inputs (dataset_ar.py:98-119)."""
    from disco_diffdock_tpu.config import GraphCaps
    from disco_diffdock_tpu.data.synthetic import make_complex_batch
    from disco_diffdock_tpu.train.train_ar import prepare_ar_sample

    caps = GraphCaps(max_lig=16, max_rec=24, lig_bond_cap=36,
                     lig_radius_cap=96, rec_edge_cap=24 * 8, cross_cap=128,
                     tor_cap=4, tor_edge_cap=48)
    batch = make_complex_batch(seed=0, batch=3, n_lig=10, n_res=16, caps=caps,
                               esm_dim=16, c_alpha_max_neighbors=8)
    N = 16 + 24
    rng0 = np.random.RandomState(0)
    soft = rng0.randn(3, 2, N).astype(np.float32)
    mask = np.zeros((3, N), bool)
    mask[:, :10] = True
    mask[:, 16 : 16 + 16] = True

    rng = np.random.RandomState(1)
    _, lat, dec, lab = prepare_ar_sample(
        rng, batch, soft, mask, 2, jax.random.PRNGKey(0), no_sampling=True)
    lab = np.asarray(lab)
    assert lab.shape == (3, N)
    np.testing.assert_allclose(lab.sum(-1), 1.0, atol=1e-5)
    assert (lab[~mask.astype(bool)] == 0).all()  # padded slots prob 0
    assert (np.asarray(lab) > 0).sum() > 3  # genuinely soft

    rng = np.random.RandomState(1)
    _, lat2, dec2, lab2 = prepare_ar_sample(
        rng, batch, soft, mask, 2, jax.random.PRNGKey(0), no_sampling=False)
    lab2 = np.asarray(lab2)
    assert set(np.unique(lab2)) <= {0.0, 1.0}
    np.testing.assert_allclose(lab2.sum(-1), 1.0)
    # raw-logit inputs, zeroed at slots >= dec_idx
    l_lig = np.asarray(lat2[0])
    d = np.asarray(dec2)
    for b in range(3):
        assert (l_lig[b, :, d[b]:] == 0).all()


def test_ar_no_randomness_uses_rdkit_pos():
    """no_randomness AR training repositions the ligand to the RAW
    pre-matching RDKit conformer before the random rotation (reference
    dataset_ar.py:91-95 resets pos to orig_rdkit_pos), not the matched
    start pose (regression)."""
    from disco_diffdock_tpu.config import GraphCaps
    from disco_diffdock_tpu.data.synthetic import make_complex_batch
    from disco_diffdock_tpu.train.train_ar import prepare_ar_sample

    caps = GraphCaps(max_lig=16, max_rec=24, lig_bond_cap=36,
                     lig_radius_cap=96, rec_edge_cap=24 * 8, cross_cap=128,
                     tor_cap=4, tor_edge_cap=48)
    batch = make_complex_batch(seed=0, batch=2, n_lig=10, n_res=16, caps=caps,
                               esm_dim=16, c_alpha_max_neighbors=8)
    rng0 = np.random.RandomState(5)
    rdkit_pos = jnp.asarray(rng0.randn(2, 16, 3).astype(np.float32) * 3)
    batch = batch.replace(extras={**batch.extras, "rdkit_pos": rdkit_pos})
    N = 16 + 24
    soft = rng0.randn(2, 2, N).astype(np.float32)
    mask = np.zeros((2, N), bool)
    mask[:, :10] = True
    mask[:, 16:32] = True

    b2, _, _, _ = prepare_ar_sample(
        np.random.RandomState(1), batch, soft, mask, 2, jax.random.PRNGKey(0),
        no_randomness=True)

    def dists(p, m):
        d = np.linalg.norm(p[:, :, None] - p[:, None], axis=-1)
        return d * (m[:, :, None] & m[:, None])

    m = np.asarray(batch.lig_mask, bool)
    got = dists(np.asarray(b2.lig_pos), m)
    np.testing.assert_allclose(got, dists(np.asarray(rdkit_pos), m), atol=1e-4)
    assert not np.allclose(got, dists(np.asarray(batch.lig_pos), m), atol=1e-2)


def test_ar_frozen_trunk_survives_weight_decay():
    """With w_decay > 0 the frozen trunk must not shrink: the decay term
    re-enters via add_decayed_weights AFTER the gradient mask, so the update
    mask must zero it too (reference freezes via requires_grad=False)."""
    from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
    from disco_diffdock_tpu.data.synthetic import make_complex_batch
    from disco_diffdock_tpu.models.ar import PretrainedScoreEncoder
    from disco_diffdock_tpu.train.plateau import make_adam
    from disco_diffdock_tpu.train.steps import TrainState
    from disco_diffdock_tpu.train.train_ar import make_ar_train_step

    caps = GraphCaps(max_lig=16, max_rec=24, lig_bond_cap=36,
                     lig_radius_cap=96, rec_edge_cap=24 * 8, cross_cap=128,
                     tor_cap=4, tor_edge_cap=48)
    score_cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2,
                                 esm_embedding_dim=16, dropout=0.0,
                                 latent_dim=2, latent_vocab=1)
    batch = make_complex_batch(seed=0, batch=2, n_lig=10, n_res=16, caps=caps,
                               esm_dim=16, c_alpha_max_neighbors=8)
    model = PretrainedScoreEncoder(score_cfg=score_cfg, caps=caps,
                                   latent_dim=1, input_latent_dim=2)
    B, NL, NR = 2, 16, 24
    lat = (jnp.zeros((B, NL, 2)), jnp.zeros((B, NR, 2)))
    dec = jnp.zeros((B,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), batch, lat, dec)
    tx = make_adam(1e-3, w_decay=1e-2)
    state = TrainState.create(variables, tx)
    N = NL + NR
    labels = jnp.asarray(np.eye(N, dtype=np.float32)[np.array([0, 17])])
    nm = np.zeros((B, N), bool)
    nm[:, :10] = True
    nm[:, 16:32] = True
    nm = jnp.asarray(nm)

    step = jax.jit(make_ar_train_step(model, tx, 2, trunk_frozen=True))
    s1, _ = step(state, batch, lat, dec, labels, nm, jax.random.PRNGKey(1))
    before = state.params["pretrained_score_model"]
    after = s1.params["pretrained_score_model"]
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(before),
            jax.tree_util.tree_leaves_with_path(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k1))

    free = jax.jit(make_ar_train_step(model, tx, 2, trunk_frozen=False))
    s2, _ = free(state, batch, lat, dec, labels, nm, jax.random.PRNGKey(1))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(s2.params["pretrained_score_model"]))
    )
    assert moved


def test_train_score_parser_accepts_reference_flags():
    import disco_diffdock_tpu.train.train_score as ts

    p_argv = [
        "--synthetic", "--ns", "4", "--sh_lmax", "2", "--no_batch_norm",
        "--tr_weight", "0.5", "--tr_sigma_max", "30", "--receptor_radius",
        "30", "--c_alpha_max_neighbors", "10", "--matching_popsize", "20",
        "--train_multiplicity", "2", "--use_old_atom_encoder",
        "--encoder_ns", "4", "--enc_nv", "2", "--restart_dir", "/tmp/x",
        "--inference_earlystop_metric", "valinf_rmsds_lt5",
        "--no-use_ema", "--no-dynamic_max_cross", "--all_atoms",
    ]
    # parse-only: pull the parser out of main by monkeypatching parse to stop
    import argparse

    real = argparse.ArgumentParser.parse_args
    captured = {}

    def fake(self, argv=None):
        ns = real(self, argv)
        captured.update(vars(ns))
        raise SystemExit(0)

    argparse.ArgumentParser.parse_args = fake
    try:
        with pytest.raises(SystemExit):
            ts.main(p_argv)
    finally:
        argparse.ArgumentParser.parse_args = real
    assert captured["sh_lmax"] == 2
    assert captured["no_batch_norm"] is True
    assert captured["tr_weight"] == 0.5
    assert captured["encoder_ns"] == 4 and captured["encoder_nv"] == 2
    assert captured["use_ema"] is False
    assert captured["dynamic_max_cross"] is False
    assert captured["inference_earlystop_metric"] == "valinf_rmsds_lt5"
    assert captured["all_atoms"] is True


def test_all_atom_score_run_roundtrip(tmp_path):
    """train_score --all_atoms produces a run dir that build_score_runtime
    loads as an AllAtomScoreModel and runs (the reference trains all-atom
    score models through the same train.py, model_utils.py:26-27)."""
    from disco_diffdock_tpu.models.all_atom_score_model import AllAtomScoreModel
    from disco_diffdock_tpu.train.loading import build_score_runtime, load_run_configs
    from disco_diffdock_tpu.train.train_score import main

    main(["--synthetic", "--steps", "1", "--all_atoms",
          "--run_name", "aa", "--log_dir", str(tmp_path)])
    run = str(tmp_path / "aa")
    score_cfg, enc_cfg, caps = load_run_configs(run)
    assert score_cfg.all_atoms and enc_cfg is None
    model, variables, latent_fn, _, _ = build_score_runtime(run, caps)
    assert isinstance(model, AllAtomScoreModel) and latent_fn is None
    from disco_diffdock_tpu.data.synthetic import make_complex_batch

    b = make_complex_batch(seed=5, batch=4, n_lig=10, n_res=24, caps=caps,
                           esm_dim=16, c_alpha_max_neighbors=8,
                           all_atoms=True, atoms_per_res=2).set_time(0.5, 0.5, 0.5)
    tr, rot, tor = model.apply(variables, b, deterministic=True,
                               use_running_average=True)
    assert tr.shape == (4, 3) and rot.shape == (4, 3)
    assert np.isfinite(np.asarray(tr)).all()
