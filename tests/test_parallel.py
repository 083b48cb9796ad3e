"""Data-parallel correctness on the virtual 8-device CPU mesh.

The reference's DataParallel has no tests (SURVEY.md section 4e); here we
verify that sharding is semantics-preserving: a deterministic forward over an
8-way sharded batch equals the unsharded forward, and the shard_map train
step runs with synchronized gradients.
"""
import jax
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.parallel import make_mesh, replicate, shard_batch, shard_train_step
from disco_diffdock_tpu.train.steps import TrainState, make_train_step

from tests.test_score_model import small_batch, small_caps, small_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    batch = small_batch(batch=8)
    variables = model.init(jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_sharded_forward_equals_unsharded(setup):
    model, variables, batch = setup
    fwd = jax.jit(
        lambda b: model.apply(variables, b, deterministic=True, use_running_average=True)
    )
    ref = fwd(batch)

    mesh = make_mesh(8)
    sharded_batch = shard_batch(batch, mesh)
    out = fwd(sharded_batch)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o), atol=1e-5)


def test_shard_map_train_step_runs_and_syncs(setup):
    model, variables, batch = setup
    tx = optax.adam(1e-3)
    state = TrainState.create(variables, tx)
    mesh = make_mesh(8)
    step = make_train_step(model, tx, SigmaSchedule(), axis_name="data")
    sharded_step = shard_train_step(step, mesh)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    new_state, aux = sharded_step(state_r, batch_s, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    assert int(new_state.step) == 1
    # params identical across devices after the psum'd update: fully
    # replicated output means a single consistent value
    leaf = jax.tree.leaves(new_state.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_sharded_train_equals_unsharded():
    """8-way sharded training reproduces the single-device trajectory: noise
    draws are keyed by GLOBAL graph id and gradients pmean over the mesh, so
    losses and updated params must match to float tolerance per step.

    batch_norm off: train-mode BN computes batch stats per shard (exactly the
    reference DataParallel's per-replica BatchNorm semantics), which is
    intentionally NOT identical to the 8-graph single-device stats."""
    cfg = small_cfg(batch_norm=False)
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    batch = small_batch(batch=8)
    variables = model.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    sigma = SigmaSchedule()

    single = jax.jit(make_train_step(model, tx, sigma))
    state1 = TrainState.create(variables, tx)

    mesh = make_mesh(8)
    sharded = shard_train_step(make_train_step(model, tx, sigma, axis_name="data"), mesh)
    state8 = replicate(TrainState.create(variables, tx), mesh)

    key = jax.random.PRNGKey(7)
    for i in range(2):
        key, k = jax.random.split(key)
        state1, aux1 = single(state1, batch, k)
        state8, aux8 = sharded(state8, shard_batch(batch, mesh), k)
        # sharded mean loss == unsharded mean loss (uniform shard occupancy)
        np.testing.assert_allclose(
            float(aux1["loss"]), float(aux8["loss"]), rtol=1e-5,
            err_msg=f"step {i}")
    # adam's m/sqrt(v) normalization amplifies f32 reduction-order noise for
    # near-zero grads; 2e-3 ~ 2x lr bounds the drift of any single update
    for l1, l8 in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), atol=2e-3)


def test_train_cli_n_devices_synthetic(tmp_path):
    """`train_score --synthetic --n_devices 8` runs end-to-end on the CPU
    mesh (VERDICT round-2 item 2: DP reachable from the training CLI)."""
    from disco_diffdock_tpu.train.train_score import main

    main([
        "--synthetic", "--steps", "2", "--n_devices", "8", "--no_latents",
        "--run_name", "dp_smoke", "--log_dir", str(tmp_path),
    ])


def test_train_cli_uneven_shards_error(tmp_path):
    """Uneven shard counts are a HARD error in every mode (VERDICT r3 item
    7): the synthetic escape hatch that let `--batch_size 4 --n_devices 3`
    shard a silently wrong per-device batch is gone."""
    import pytest

    from disco_diffdock_tpu.train.train_score import main

    with pytest.raises(SystemExit, match="must divide"):
        main([
            "--synthetic", "--steps", "1", "--n_devices", "2",
            "--batch_size", "3", "--no_latents",
            "--ns", "4", "--nv", "2", "--num_conv_layers", "2",
            "--run_name", "dp_uneven", "--log_dir", str(tmp_path),
        ])


class TestShardedEval:
    def test_sharded_eval_matches_unsharded(self, tmp_path):
        """Mesh-sharded evaluation (batch axis over 8 virtual devices)
        reproduces the single-device metrics -- inference is batch-parallel,
        so sharding must be a pure partitioning."""
        import json
        import os

        from disco_diffdock_tpu.eval.evaluate import main

        common = ["--synthetic", "--n_complexes", "2",
                  "--samples_per_complex", "8", "--inference_steps", "2"]
        m1 = main(common + ["--out_dir", str(tmp_path / "single")])
        m8 = main(common + ["--n_devices", "8", "--out_dir", str(tmp_path / "mesh")])
        assert np.isfinite(m8["rmsds_below_5"])
        # the synthetic caps must hold the full t=1 pair grid for the CG
        # family too (a truncating cap would make this comparison vacuous)
        assert all(v == 0 for v in m1["edge_overflow"].values()), m1["edge_overflow"]
        for key in ("rmsds_below_2", "rmsds_below_5", "best_rmsds_mean"):
            if key in m1:
                assert abs(m1[key] - m8[key]) < 1e-3, (key, m1[key], m8[key])
        r1 = np.load(os.path.join(tmp_path, "single", "rmsds.npy"))
        r8 = np.load(os.path.join(tmp_path, "mesh", "rmsds.npy"))
        np.testing.assert_allclose(r1, r8, atol=1e-3)
