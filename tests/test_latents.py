"""Tests for the latent encoder, joint wrapper, and AR prior."""
import jax
import jax.numpy as jnp
import numpy as np

from disco_diffdock_tpu.config import EncoderConfig
from disco_diffdock_tpu.models.ar import PretrainedScoreEncoder, encode_ar
from disco_diffdock_tpu.models.encoder import TPEncoder
from disco_diffdock_tpu.models.wrapper import ModelWrapper

from tests.test_score_model import small_batch, small_caps, small_cfg


def enc_cfg(**kw):
    base = dict(
        ns=8, nv=2, num_conv_layers=3, dropout=0.0, esm_embedding_dim=16,
        latent_dim=2, latent_vocab=1, latent_dropout=0.0,
    )
    base.update(kw)
    return EncoderConfig(**base)


class TestTPEncoder:
    def test_onehot_latents(self):
        model = TPEncoder(cfg=enc_cfg(), caps=small_caps())
        batch = small_batch()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, batch
        )
        (lat_l, lat_r), _ = model.apply(
            variables, batch, latent_temperature=0.01,
            rngs={"gumbel": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        # each latent slot selects exactly one node across lig+rec per graph
        total = np.asarray(lat_l).sum(1) + np.asarray(lat_r).sum(1)  # (B, Ld)
        np.testing.assert_allclose(total, 1.0, atol=1e-4)
        # selected nodes are valid (never padded slots)
        lm = np.asarray(batch.lig_mask)
        rm = np.asarray(batch.rec_mask)
        assert np.abs(np.asarray(lat_l)[~lm]).max() < 1e-6
        assert np.abs(np.asarray(lat_r)[~rm]).max() < 1e-6

    def test_logits_mode_for_ar_training(self):
        model = TPEncoder(cfg=enc_cfg(apply_gumbel_softmax=False), caps=small_caps())
        batch = small_batch()
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
        (logits, mask), _ = model.apply(variables, batch, mutable=["batch_stats"])
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]
        assert logits.shape == (B, 2, NL + NR)
        assert mask.shape == (B, NL + NR)

    def test_vocab_gt1(self):
        model = TPEncoder(cfg=enc_cfg(latent_vocab=8), caps=small_caps())
        batch = small_batch()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, batch
        )
        lat, _ = model.apply(
            variables, batch, latent_temperature=0.5,
            rngs={"gumbel": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        assert lat.shape == (2, 2, 8)
        np.testing.assert_allclose(np.asarray(lat).sum(-1), 1.0, atol=1e-4)


    def test_vocab_gt1_ar_conditioning(self):
        """AR-decoder conditioning with latent_vocab > 1 and no virtual
        nodes: input_latent is one (B, latent_dim, vocab) array flattened
        and broadcast per node, with src-only edge conditioning
        (latent_encoder.py:174-178,361-364; regression: tuple-unpacking the
        array crashed or silently mis-split the batch)."""
        cfg = enc_cfg(latent_vocab=4, input_latent_dim=2, use_oracle=False,
                      apply_gumbel_softmax=False)
        model = TPEncoder(cfg=cfg, caps=small_caps())
        batch = small_batch(batch=3)
        B = batch.num_graphs
        input_latent = jax.nn.one_hot(
            jnp.asarray(np.random.RandomState(0).randint(0, 4, (B, 2))), 4)
        dec = jnp.asarray([0, 1, 0], jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               input_latent=input_latent, decoding_idx=dec)
        out, _ = model.apply(variables, batch, input_latent=input_latent,
                             decoding_idx=dec, mutable=["batch_stats"])
        logits = out[0] if isinstance(out, tuple) else out
        assert np.isfinite(np.asarray(logits)).any()


class TestModelWrapper:
    def test_joint_forward_and_droprate(self):
        wrapper = ModelWrapper(
            score_cfg=small_cfg(latent_dim=2, latent_vocab=1, latent_droprate=0.1),
            encoder_cfg=enc_cfg(),
            caps=small_caps(),
            latent_droprate=0.1,
        )
        batch = small_batch()
        rngs = {
            "params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
            "droprate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3),
        }
        variables = wrapper.init(rngs, batch, deterministic=False)
        (tr, rot, tor), _ = wrapper.apply(
            variables, batch, deterministic=False, mutable=["batch_stats"],
            rngs={k: v for k, v in rngs.items() if k != "params"},
        )
        assert tr.shape == (2, 3) and np.all(np.isfinite(np.asarray(tr)))

    def test_gradients_flow_to_encoder(self):
        """Straight-through Gumbel must propagate gradients into the encoder."""
        wrapper = ModelWrapper(
            score_cfg=small_cfg(latent_dim=2, latent_vocab=1, latent_droprate=0.0),
            encoder_cfg=enc_cfg(),
            caps=small_caps(),
        )
        batch = small_batch()
        rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
        variables = wrapper.init(rngs, batch, deterministic=False)

        def loss(params):
            (tr, rot, tor), _ = wrapper.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, deterministic=False, mutable=["batch_stats"],
                rngs={"gumbel": jax.random.PRNGKey(4), "dropout": jax.random.PRNGKey(5)},
            )
            return jnp.sum(tr**2)

        g = jax.grad(loss)(variables["params"])
        enc_g = g["encoder"]
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(enc_g))
        assert total > 0, "no gradient reached the encoder through the latents"


class TestAR:
    def test_encode_ar_sequential(self):
        score_cfg = small_cfg(latent_dim=2, latent_vocab=1, latent_droprate=0.1)
        model = PretrainedScoreEncoder(
            score_cfg=score_cfg, caps=small_caps(), latent_dim=1, input_latent_dim=2,
        )
        batch = small_batch()
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]
        lat0 = (jnp.zeros((B, NL, 2)), jnp.zeros((B, NR, 2)))
        variables = model.init(
            jax.random.PRNGKey(0), batch, lat0, jnp.zeros((B,), jnp.int32)
        )

        def apply_fn(b, lat, dec):
            out, _ = model.apply(variables, b, lat, dec, mutable=["batch_stats"])
            return out

        lat_l, lat_r = encode_ar(apply_fn, batch, jax.random.PRNGKey(1), 2, 1.0)
        total = np.asarray(lat_l).sum(1) + np.asarray(lat_r).sum(1)
        np.testing.assert_allclose(total, 1.0, atol=1e-5)
        # argmax mode deterministic
        l1 = encode_ar(apply_fn, batch, jax.random.PRNGKey(2), 2, 1000.0)
        l2 = encode_ar(apply_fn, batch, jax.random.PRNGKey(3), 2, 1000.0)
        np.testing.assert_allclose(np.asarray(l1[0]), np.asarray(l2[0]))
