"""Reference-scale streaming input pipeline (VERDICT r3 item 1).

The reference trains through DataLoader workers that featurize/collate ahead
of the device (datasets_utils/pdbbind.py:384-406) and never materializes a
split.  These tests pin the TPU rebuild's equivalents: lazy bucket-laddered
batch streams (data/pdbbind.bucketed_batches), the background prefetcher
(data/prefetch.py), the ladder constructor (data/collate.ladder_for_datasets),
and multi-bucket loss equivalence (padding must not change results).
"""
from __future__ import annotations

import time

import jax
import numpy as np
import pytest

from disco_diffdock_tpu.config import GraphCaps
from disco_diffdock_tpu.data.collate import (
    DEFAULT_BUCKETS, caps_from_datasets, fits, ladder_for_datasets)
from disco_diffdock_tpu.data.pdbbind import assign_buckets, bucketed_batches
from disco_diffdock_tpu.data.prefetch import Prefetcher, prefetch
from disco_diffdock_tpu.data.synthetic import RecordDataset, make_complex_record

SMALL = GraphCaps(max_lig=12, max_rec=16, lig_bond_cap=24, lig_radius_cap=144,
                  rec_edge_cap=16 * 8, cross_cap=192, tor_cap=4, tor_edge_cap=48)
BIG = GraphCaps(max_lig=24, max_rec=40, lig_bond_cap=48, lig_radius_cap=576,
                rec_edge_cap=40 * 8, cross_cap=960, tor_cap=16, tor_edge_cap=384)
# BIG with SMALL's tor_cap: the torsion noise draw is shaped by tor_cap, so
# the bucket-equivalence test holds it fixed while node/edge padding varies
import dataclasses as _dc

BIG_EQ = _dc.replace(BIG, tor_cap=4, tor_edge_cap=96)


def mixed_dataset(n_small=6, n_big=4):
    recs = [make_complex_record(seed=s, n_lig=8, n_res=12) for s in range(n_small)]
    recs += [make_complex_record(seed=100 + s, n_lig=20, n_res=36)
             for s in range(n_big)]
    return RecordDataset(recs)


class TestBucketAssignment:
    def test_first_fit_groups(self):
        ds = mixed_dataset()
        groups, oversized = assign_buckets(ds, (SMALL, BIG))
        assert len(groups[0]) == 6 and len(groups[1]) == 4
        assert not oversized

    def test_oversized_detected(self):
        ds = mixed_dataset(n_small=2, n_big=2)
        groups, oversized = assign_buckets(ds, (SMALL,))
        assert len(groups[0]) == 2 and len(oversized) == 2

    def test_oversized_raises_when_not_dropping(self):
        ds = mixed_dataset(n_small=2, n_big=1)
        with pytest.raises(ValueError, match="exceed the largest bucket"):
            list(bucketed_batches(ds, 1, np.random.RandomState(0),
                                  buckets=(SMALL,), esm_dim=0,
                                  drop_oversized=False))


class TestBucketedStream:
    def test_with_info_shapes_and_coverage(self):
        ds = mixed_dataset()
        seen = []
        for batch, info in bucketed_batches(
                ds, 2, np.random.RandomState(0), buckets=(SMALL, BIG),
                esm_dim=0, drop_remainder=False, with_info=True):
            caps = info["caps"]
            assert batch.lig_x.shape[1] == caps.max_lig
            assert batch.rec_x.shape[1] == caps.max_rec
            assert len(info["names"]) == batch.num_graphs
            # every record in the batch actually fits its bucket
            for i in info["indices"]:
                assert fits(ds.records[i], caps)
            seen += info["names"]
        assert sorted(seen) == sorted(ds.names)  # full coverage, no dupes

    def test_stream_is_lazy(self):
        """Pulling ONE batch must not materialize the split: record loads
        stay bounded by the batch size (sizes() metadata reads are free)."""
        ds = mixed_dataset(n_small=40, n_big=0)
        it = bucketed_batches(ds, 4, np.random.RandomState(0),
                              buckets=(SMALL,), esm_dim=0, with_info=True)
        assert ds.loads == 0  # generator not started
        next(it)
        assert ds.loads <= 4, f"eager materialization: {ds.loads} loads"

    def test_prefetched_stream_stays_bounded(self):
        ds = mixed_dataset(n_small=40, n_big=0)
        stream = prefetch(
            bucketed_batches(ds, 4, np.random.RandomState(0),
                             buckets=(SMALL,), esm_dim=0, with_info=True),
            depth=2,
        )
        next(stream)
        time.sleep(0.5)  # let the worker run ahead
        # depth in-queue + 1 in-hand + 1 being built = <= 4 batches of loads
        assert ds.loads <= 4 * 4, f"prefetch ran unbounded: {ds.loads} loads"
        stream.close()


class TestPrefetcher:
    def test_order_and_completion(self):
        out = list(prefetch(iter(range(50)), depth=3))
        assert out == list(range(50))

    def test_exception_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("boom")

        it = prefetch(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            next(it)

    def test_early_close_does_not_hang(self):
        def gen():
            for i in range(10_000):
                yield i

        it = Prefetcher(gen(), depth=1)
        next(it)
        it.close()
        t0 = time.time()
        it._thread.join(timeout=5.0)
        assert not it._thread.is_alive(), "worker leaked after close()"
        assert time.time() - t0 < 5.0


class TestLadder:
    def test_catch_all_is_exact_fit(self):
        ds = mixed_dataset()
        ladder = ladder_for_datasets([ds])
        exact = caps_from_datasets([ds])
        assert ladder[-1] == exact
        # no complex is ever dropped with the catch-all present
        _, oversized = assign_buckets(ds, ladder)
        assert not oversized

    def test_prunes_buckets_larger_than_exact(self):
        ds = mixed_dataset()
        ladder = ladder_for_datasets([ds])
        exact = ladder[-1]
        for b in ladder[:-1]:
            assert b.max_lig <= exact.max_lig and b.max_rec <= exact.max_rec
        # the tiny fixtures fit below every DEFAULT bucket -> pure catch-all
        assert all(b in DEFAULT_BUCKETS for b in ladder[:-1])


class TestLadderCLI:
    def test_score_trainer_multi_bucket_ladder(self, monkeypatch, capsys):
        """The score-trainer CLI in --bucket_mode ladder over a dataset
        whose sizes straddle DEFAULT_BUCKETS[0]: two compiled buckets, the
        per-epoch edge-overflow audit surfaced per bucket, and record loads
        bounded by streaming (never the samples_per_complex-style eager
        materialization the round-3 verdict flagged)."""
        from disco_diffdock_tpu.data import pdbbind as pdbbind_mod
        from disco_diffdock_tpu.train.train_score import main

        # small fits DEFAULT_BUCKETS[0] (lig<=24, rec<=128); big exceeds it
        # (28 atoms -> ~70 bidirectional bond slots > 56) and lands in the
        # exact-fit catch-all
        small = [make_complex_record(seed=s, n_lig=12, n_res=40, esm_dim=4,
                                     c_alpha_max_neighbors=8)
                 for s in range(4)]
        big = [make_complex_record(seed=100 + s, n_lig=28, n_res=140,
                                   esm_dim=4, c_alpha_max_neighbors=8)
               for s in range(2)]
        made = {}

        def fake_pdbbind(cfg):
            which = "train" if "train" in cfg.split_path else "val"
            made[which] = RecordDataset(
                small + big if which == "train" else small[:2])
            return made[which]

        monkeypatch.setattr(pdbbind_mod, "PDBBind", fake_pdbbind)
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            main([
                "--data_dir", "unused", "--split_train", "train.txt",
                "--split_val", "val.txt", "--cache_path", td,
                "--bucket_mode", "ladder", "--no_latents",
                "--ns", "4", "--nv", "2", "--num_conv_layers", "2",
                "--dropout", "0.0", "--esm_embedding_dim", "4",
                "--batch_size", "2", "--n_epochs", "1",
                "--val_inference_freq", "0",
                "--run_name", "ladder", "--log_dir", td,
            ])
        out = capsys.readouterr().out
        assert "bucket_mode=ladder" in out
        # two populated buckets: b0 (the DEFAULT small bucket) + catch-all
        line = next(l for l in out.splitlines() if "bucket_mode=ladder" in l)
        assert "b0(" in line and "b1(" in line, line
        # the per-epoch overflow audit ran for every bucket
        assert out.count("edge-overflow audit") >= 2, out
        # streaming: loads stay linear in the epoch passes (ladder
        # construction + train epoch + audit batch + val), never
        # poses-per-complex replication of the split
        n = len(made["train"])
        assert made["train"].loads <= 4 * n, made["train"].loads


class TestPadRemainder:
    """A bucket's final partial group pads to batch_size with graph_mask-ed
    repeats: fixed shapes (one program per bucket, DP-shardable) and no
    complex ever dropped -- drop_remainder would PERMANENTLY exclude every
    complex in a bucket with fewer than batch_size members."""

    def test_collate_pad_graphs_to(self):
        from disco_diffdock_tpu.data.collate import collate

        recs = [make_complex_record(seed=s, n_lig=8, n_res=12) for s in range(3)]
        b = collate(recs, SMALL, esm_dim=0, pad_graphs_to=4)
        assert b.num_graphs == 4
        np.testing.assert_array_equal(np.asarray(b.graph_mask),
                                      [True, True, True, False])
        # pads repeat real records (zero-dummies would have degenerate
        # geometry whose NaNs poison the masked loss: NaN * 0 == NaN)
        np.testing.assert_array_equal(np.asarray(b.lig_pos[3]),
                                      np.asarray(b.lig_pos[0]))

    def test_stream_pads_and_covers_small_buckets(self):
        ds = mixed_dataset(n_small=6, n_big=3)  # big bucket: 3 < batch 4
        seen = []
        for batch, info in bucketed_batches(
                ds, 4, np.random.RandomState(0), buckets=(SMALL, BIG),
                esm_dim=0, pad_remainder=True, with_info=True):
            assert batch.num_graphs == 4  # fixed shape for every batch
            assert int(np.asarray(batch.graph_mask).sum()) == len(info["names"])
            seen += info["names"]
        # full coverage incl. the 3-member big bucket, no duplicates
        assert sorted(seen) == sorted(ds.names)

    def test_masked_loss_equals_partial_batch(self):
        """Padded repeats are invisible to results: per-graph val losses on
        the valid rows equal the unpadded partial batch's, and the
        graph_mask-weighted mean matches."""
        from disco_diffdock_tpu.config import ScoreModelConfig
        from disco_diffdock_tpu.data.collate import collate
        from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
        from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
        from disco_diffdock_tpu.train.steps import make_val_step

        recs = [make_complex_record(seed=s, n_lig=8, n_res=12) for s in range(3)]
        cfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=2,
                               esm_embedding_dim=0, dropout=0.0,
                               latent_dim=0, latent_droprate=0.0,
                               compute_dtype="float32")
        sigma = SigmaSchedule()
        model = TensorProductScoreModel(cfg=cfg, caps=SMALL)
        b_part = collate(recs, SMALL, esm_dim=0)
        b_pad = collate(recs, SMALL, esm_dim=0, pad_graphs_to=4)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), b_part)
        val = jax.jit(make_val_step(model, sigma))
        aux_p, _, gm_p = val(variables, b_part, jax.random.PRNGKey(3))
        aux_f, _, gm_f = val(variables, b_pad, jax.random.PRNGKey(3))
        assert np.asarray(gm_p).all() and not np.asarray(gm_f)[3]
        np.testing.assert_allclose(np.asarray(aux_f["loss"])[:3],
                                   np.asarray(aux_p["loss"]),
                                   rtol=2e-4, atol=2e-5)
        gm = np.asarray(gm_f, np.float32)
        masked_mean = (np.asarray(aux_f["loss"]) * gm).sum() / gm.sum()
        np.testing.assert_allclose(masked_mean,
                                   np.asarray(aux_p["loss"]).mean(),
                                   rtol=2e-4, atol=2e-5)


class TestMultiBucketEquivalence:
    def test_val_loss_independent_of_bucket(self):
        """The same complexes collated into two different-capacity buckets
        (same tor_cap -- the torsion noise draw is shaped by it) must produce
        identical per-graph validation losses: bucket choice is a padding
        decision, never a results decision."""
        from disco_diffdock_tpu.config import ScoreModelConfig
        from disco_diffdock_tpu.data.collate import collate
        from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
        from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
        from disco_diffdock_tpu.train.steps import make_val_step

        recs = [make_complex_record(seed=s, n_lig=8, n_res=12) for s in range(2)]
        cfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=2,
                               esm_embedding_dim=0, dropout=0.0,
                               latent_dim=0, latent_droprate=0.0,
                               compute_dtype="float32")
        sigma = SigmaSchedule()
        losses = {}
        b_small = collate(recs, SMALL, esm_dim=0)
        model_small = TensorProductScoreModel(cfg=cfg, caps=SMALL)
        variables = jax.jit(model_small.init)(jax.random.PRNGKey(0), b_small)
        for caps in (SMALL, BIG_EQ):
            model = TensorProductScoreModel(cfg=cfg, caps=caps)
            batch = collate(recs, caps, esm_dim=0)
            val = jax.jit(make_val_step(model, sigma))
            aux, _, _ = val(variables, batch, jax.random.PRNGKey(3))
            losses[caps] = np.asarray(aux["loss"])
        np.testing.assert_allclose(losses[SMALL], losses[BIG_EQ],
                                   rtol=2e-4, atol=2e-5)
