"""Sampler tests: the jitted 20-step reverse SDE on a synthetic complex."""
import jax
import jax.numpy as jnp
import numpy as np

from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.sampling import SamplerConfig, randomize_position, sampling

from tests.test_score_model import small_batch, small_caps, small_cfg


def test_randomize_position():
    batch = small_batch()
    rb = randomize_position(jax.random.PRNGKey(0), batch, False, False, 19.0)
    # positions moved, shapes preserved, masked slots noise-only rigid
    assert rb.lig_pos.shape == batch.lig_pos.shape
    moved = np.abs(np.asarray(rb.lig_pos - batch.lig_pos)).max()
    assert moved > 1.0
    # bond lengths preserved under torsion+rigid randomization
    b = batch.lig_bonds
    def lengths(pos):
        p = np.asarray(pos)
        out = []
        for g in range(p.shape[0]):
            s, d, m = np.asarray(b.src[g]), np.asarray(b.dst[g]), np.asarray(b.mask[g])
            out.append(np.linalg.norm(p[g, s[m]] - p[g, d[m]], axis=-1))
        return np.concatenate(out)
    np.testing.assert_allclose(lengths(rb.lig_pos), lengths(batch.lig_pos), atol=1e-3)


def test_full_sampling_loop():
    """End-to-end: randomize, 8-step jitted reverse SDE, finite outputs."""
    cfg = small_cfg()
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    batch = small_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)

    scfg = SamplerConfig(inference_steps=8, no_final_step_noise=True, return_trajectory=True)
    sigma = SigmaSchedule()
    rb = randomize_position(jax.random.PRNGKey(1), batch, False, False, sigma.tr_sigma_max)

    @jax.jit
    def run(b, key):
        final, conf, traj = sampling(model, variables, b, key, scfg, sigma)
        return final.lig_pos, traj

    pos, traj = run(rb, jax.random.PRNGKey(2))
    assert traj.shape == (8,) + batch.lig_pos.shape
    assert np.all(np.isfinite(np.asarray(pos)))
    # ligand must stay a sane molecule: bond lengths preserved through 8 steps
    p = np.asarray(pos)
    s = np.asarray(batch.lig_bonds.src[0])
    d = np.asarray(batch.lig_bonds.dst[0])
    m = np.asarray(batch.lig_bonds.mask[0])
    l_new = np.linalg.norm(p[0, s[m]] - p[0, d[m]], axis=-1)
    p0 = np.asarray(batch.lig_pos)
    l_old = np.linalg.norm(p0[0, s[m]] - p0[0, d[m]], axis=-1)
    np.testing.assert_allclose(l_new, l_old, atol=1e-2)


def test_temperature_and_ode_modes():
    cfg = small_cfg()
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    batch = small_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    sigma = SigmaSchedule()
    rb = randomize_position(jax.random.PRNGKey(1), batch, False, False, sigma.tr_sigma_max)

    # DisCo-DiffDock-S temperature constants (README.md:20)
    scfg = SamplerConfig(
        inference_steps=4,
        temp_sampling=(1.547, 4.005, 3.650),
        temp_psi=(1.269, 1.276, 2.063),
        temp_sigma_data=(0.846, 0.453, 0.329),
    )
    final, _, _ = jax.jit(
        lambda b, k: sampling(model, variables, b, k, scfg, sigma)
    )(rb, jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.asarray(final.lig_pos)))

    scfg_ode = SamplerConfig(inference_steps=4, ode=True)
    final2, _, _ = jax.jit(
        lambda b, k: sampling(model, variables, b, k, scfg_ode, sigma)
    )(rb, jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.asarray(final2.lig_pos)))
    # ODE mode is deterministic: same key, same result
    final3, _, _ = jax.jit(
        lambda b, k: sampling(model, variables, b, k, scfg_ode, sigma)
    )(rb, jax.random.PRNGKey(4))
    np.testing.assert_allclose(
        np.asarray(final2.lig_pos), np.asarray(final3.lig_pos), atol=1e-5
    )


def test_cfg_guidance_runs():
    cfg = small_cfg(latent_dim=2, latent_vocab=1, latent_droprate=0.1)
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    batch = small_batch()
    B, NL = batch.lig_x.shape[:2]
    NR = batch.rec_x.shape[1]
    lat = (
        jnp.zeros((B, NL, 2)).at[:, 0, 0].set(1.0),
        jnp.zeros((B, NR, 2)).at[:, 1, 1].set(1.0),
    )
    variables = model.init(
        jax.random.PRNGKey(0), batch, latent=lat, unconditional=jnp.zeros((B, 1))
    )
    sigma = SigmaSchedule()
    scfg = SamplerConfig(inference_steps=3, cfg_weight=0.5)
    final, _, _ = jax.jit(
        lambda b, k: sampling(model, variables, b, k, scfg, sigma, latent=lat)
    )(batch, jax.random.PRNGKey(5))
    assert np.all(np.isfinite(np.asarray(final.lig_pos)))


def test_confidence_reranking_path():
    cfg = small_cfg()
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    conf_model = TensorProductScoreModel(cfg=small_cfg(confidence_mode=True), caps=small_caps())
    batch = small_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    conf_vars = conf_model.init(jax.random.PRNGKey(1), batch.set_time(0, 0, 0))
    sigma = SigmaSchedule()
    scfg = SamplerConfig(inference_steps=3)
    final, conf, _ = jax.jit(
        lambda b, k: sampling(
            model, variables, b, k, scfg, sigma,
            confidence_model=conf_model, confidence_variables=conf_vars,
        )
    )(batch, jax.random.PRNGKey(6))
    assert conf.shape == (2,)
    assert np.all(np.isfinite(np.asarray(conf)))


def test_multioutput_confidence_sliced_to_class0():
    """--rmsd_classification_cutoff confidence runs have K>1 outputs; ranking
    uses the class-0 logit (rmsd below the lowest cutoff), reference
    evaluate.py:317-318 -- sampling() must return (B,), never (B, K), or
    downstream argsort/aggregation breaks."""
    cfg = small_cfg()
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    conf_model = TensorProductScoreModel(
        cfg=small_cfg(confidence_mode=True, num_confidence_outputs=3),
        caps=small_caps())
    batch = small_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    conf_vars = conf_model.init(jax.random.PRNGKey(1), batch.set_time(0, 0, 0))
    # the raw head really is multi-output...
    raw = conf_model.apply(conf_vars, batch.set_time(0, 0, 0),
                           deterministic=True, use_running_average=True)
    assert raw.shape == (2, 3)
    # ...and sampling() reduces it to the class-0 score per pose
    final, conf, _ = jax.jit(
        lambda b, k: sampling(
            model, variables, b, k, SamplerConfig(inference_steps=2),
            SigmaSchedule(),
            confidence_model=conf_model, confidence_variables=conf_vars,
        )
    )(batch, jax.random.PRNGKey(6))
    assert conf.shape == (2,)
    assert np.all(np.isfinite(np.asarray(conf)))


def test_segmented_scan_matches_single_scan():
    """A (n1, model) + (n2, model) segment schedule must be bit-identical to
    the single-scan path: the rng key and positions flow through the carry."""
    cfg = small_cfg()
    caps = small_caps()
    model = TensorProductScoreModel(cfg=cfg, caps=caps)
    batch = small_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    scfg = SamplerConfig(inference_steps=8, no_final_step_noise=True)
    sigma = SigmaSchedule()
    rb = randomize_position(jax.random.PRNGKey(1), batch, False, False, sigma.tr_sigma_max)

    @jax.jit
    def run_single(b, key):
        return sampling(model, variables, b, key, scfg, sigma)[0].lig_pos

    @jax.jit
    def run_segmented(b, key):
        return sampling(
            [(3, model), (5, model)], variables, b, key, scfg, sigma
        )[0].lig_pos

    a = np.asarray(run_single(rb, jax.random.PRNGKey(2)))
    b = np.asarray(run_segmented(rb, jax.random.PRNGKey(2)))
    # same math, same rng stream; tolerance only for XLA fusion-order
    # rounding differences between the two compiled programs
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_ar_conditioning_pose():
    """The AR prior's conditioning pose (reference ar_pos,
    utils/sampling.py:36-46): rotated raw-RDKit conformer under
    no_randomness, the given (randomized) batch otherwise."""
    from disco_diffdock_tpu.sampling import ar_conditioning_pose

    batch = small_batch()
    rdkit = jnp.asarray(
        np.random.RandomState(3).randn(*batch.lig_pos.shape).astype(np.float32))
    b = batch.replace(extras={**batch.extras, "rdkit_pos": rdkit})

    assert ar_conditioning_pose(b, jax.random.PRNGKey(0), False) is b

    out = ar_conditioning_pose(b, jax.random.PRNGKey(0), True)
    m = np.asarray(batch.lig_mask, bool)

    def dists(p):
        d = np.linalg.norm(p[:, :, None] - p[:, None], axis=-1)
        return d * (m[:, :, None] & m[:, None])

    np.testing.assert_allclose(dists(np.asarray(out.lig_pos)),
                               dists(np.asarray(rdkit)), atol=1e-4)
    assert not np.allclose(dists(np.asarray(out.lig_pos)),
                           dists(np.asarray(batch.lig_pos)), atol=1e-2)


def test_reference_defaults_and_ode_temp_guard():
    """SamplerConfig defaults match the reference sampling() kwargs
    (no_final_step_noise=False, utils/sampling.py:51 — the confidence pose
    cache and validation inference run with final-step noise ON), and
    combining --ode with low-temperature sampling errors loudly instead of
    silently injecting SDE noise (the reference raises NameError there)."""
    assert SamplerConfig().no_final_step_noise is False

    cfg = small_cfg()
    caps = small_caps()
    model = TensorProductScoreModel(cfg=cfg, caps=caps)
    batch = small_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    scfg = SamplerConfig(inference_steps=2, ode=True,
                         temp_sampling=(0.5, 1.0, 1.0))
    sigma = SigmaSchedule()
    import pytest

    with pytest.raises(ValueError, match="ode"):
        sampling(model, variables, batch, jax.random.PRNGKey(1), scfg, sigma)


def test_actual_steps_full_remaining_dt():
    """--actual_steps' final executed step integrates the FULL remaining
    time to t=0 (reference dt = schedule[t_idx] on the last loop iteration,
    utils/sampling.py:107-110): with a model whose scores are zero the pose
    is noise-only, so compare the noise scale instead — run with
    no_random=True (zero noise) and check truncation equals running the
    truncated schedule directly with its final-jump dt."""
    cfg = small_cfg()
    caps = small_caps()
    model = TensorProductScoreModel(cfg=cfg, caps=caps)
    batch = small_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    sigma = SigmaSchedule()
    rb = randomize_position(jax.random.PRNGKey(1), batch, False, False,
                            sigma.tr_sigma_max)

    from disco_diffdock_tpu.geom.diffusion import get_t_schedule

    t8 = get_t_schedule(8)

    @jax.jit
    def run_truncated(b, key):
        scfg = SamplerConfig(inference_steps=8, actual_steps=3, no_random=True)
        return sampling(model, variables, b, key, scfg, sigma)[0].lig_pos

    @jax.jit
    def run_explicit(b, key):
        # same three t-values as an explicit schedule: reverse_diffusion
        # gives the final step dt = t[-1] by construction
        scfg = SamplerConfig(inference_steps=3, no_random=True)
        return sampling(model, variables, b, key, scfg, sigma,
                        t_schedule=t8[:3])[0].lig_pos

    a = np.asarray(run_truncated(rb, jax.random.PRNGKey(2)))
    b = np.asarray(run_explicit(rb, jax.random.PRNGKey(2)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_actual_steps_truncates_segments():
    """--actual_steps composes with a (n, model) segment schedule: the
    segments are truncated to the first actual_steps steps and match the
    single-scan truncated run (regression: this combination used to trip
    the segment-sum assertion at trace time)."""
    cfg = small_cfg()
    caps = small_caps()
    model = TensorProductScoreModel(cfg=cfg, caps=caps)
    batch = small_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    scfg = SamplerConfig(inference_steps=8, actual_steps=4,
                         no_final_step_noise=True)
    sigma = SigmaSchedule()
    rb = randomize_position(jax.random.PRNGKey(1), batch, False, False,
                            sigma.tr_sigma_max)

    @jax.jit
    def run_single(b, key):
        return sampling(model, variables, b, key, scfg, sigma)[0].lig_pos

    @jax.jit
    def run_segmented(b, key):
        return sampling(
            [(3, model), (5, model)], variables, b, key, scfg, sigma
        )[0].lig_pos

    a = np.asarray(run_single(rb, jax.random.PRNGKey(2)))
    b = np.asarray(run_segmented(rb, jax.random.PRNGKey(2)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_segmented_caps_change_only_capacity():
    """Segments may close over models with different edge capacities; with
    capacities large enough to hold every true edge the result is unchanged."""
    cfg = small_cfg()
    caps = small_caps()
    big = caps.scaled(cross_cap=caps.max_lig * caps.max_rec,
                      lig_radius_cap=caps.max_lig * caps.max_lig)
    model = TensorProductScoreModel(cfg=cfg, caps=caps)
    model_big = TensorProductScoreModel(cfg=cfg, caps=big)
    batch = small_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    scfg = SamplerConfig(inference_steps=6, no_final_step_noise=True)
    sigma = SigmaSchedule()
    rb = randomize_position(jax.random.PRNGKey(1), batch, False, False, sigma.tr_sigma_max)

    @jax.jit
    def run(b, key):
        return sampling(
            [(2, model_big), (4, model)], variables, b, key, scfg, sigma
        )[0].lig_pos

    pos = np.asarray(run(rb, jax.random.PRNGKey(2)))
    assert np.all(np.isfinite(pos))


def test_cfg_window_skip():
    """Outside [cfg_end, cfg_start] no unconditional forward runs; a window
    covering zero steps must equal cfg_weight=0 exactly.  The model carries
    latents so the unconditional branch genuinely changes the scores."""
    cfg = small_cfg(latent_dim=2, latent_vocab=1, latent_droprate=0.1)
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    batch = small_batch()
    B, NL = batch.lig_x.shape[:2]
    NR = batch.rec_x.shape[1]
    lat = (
        jnp.zeros((B, NL, 2)).at[:, 0, 0].set(1.0),
        jnp.zeros((B, NR, 2)).at[:, 1, 1].set(1.0),
    )
    variables = model.init(
        jax.random.PRNGKey(0), batch, latent=lat, unconditional=jnp.zeros((B, 1))
    )
    sigma = SigmaSchedule()
    rb = randomize_position(jax.random.PRNGKey(1), batch, False, False, sigma.tr_sigma_max)

    no_cfg = SamplerConfig(inference_steps=4, cfg_weight=0.0)
    empty_window = SamplerConfig(inference_steps=4, cfg_weight=0.7,
                                 cfg_start=0.012, cfg_end=0.011)
    mid_window = SamplerConfig(inference_steps=4, cfg_weight=0.7,
                               cfg_start=0.8, cfg_end=0.4)

    def run(scfg, b, key):
        return np.asarray(jax.jit(
            lambda bb, k: sampling(model, variables, bb, k, scfg, sigma,
                                   latent=lat)[0].lig_pos
        )(b, key))

    a = run(no_cfg, rb, jax.random.PRNGKey(2))
    b = run(empty_window, rb, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(a, b)
    # an in-window CFG run must actually differ
    c = run(mid_window, rb, jax.random.PRNGKey(2))
    assert np.abs(a - c).max() > 1e-6


def test_decode_latent_anchors_gating():
    """Anchor decode applies only to the equivariant (lig, rec) one-hot pair;
    vocab>1 / virtual-node latents arrive as a single invariant array and
    must return None instead of unpacking the batch axis into garbage."""
    from disco_diffdock_tpu.sampling.sampler import decode_latent_anchors

    batch = small_batch()
    B, NL = batch.lig_x.shape[:2]
    NR = batch.rec_x.shape[1]
    # equivariant pair: slot 0 -> ligand node 1, slot 1 -> receptor node 0
    lat_l = np.zeros((B, NL, 2), np.float32)
    lat_r = np.zeros((B, NR, 2), np.float32)
    lat_l[:, 1, 0] = 1.0
    lat_r[:, 0, 1] = 1.0
    out = decode_latent_anchors(batch, (lat_l, lat_r))
    assert out is not None and out[0]["latent_str"] == "L1R0"
    # single invariant array (vocab>1 path), B == 2 would silently split
    assert decode_latent_anchors(batch, np.zeros((B, 2, 4), np.float32)) is None
    assert decode_latent_anchors(batch, None) is None
