"""Equivariance + correctness tests for the NN stack (SURVEY.md section 4b)."""
import jax
import jax.numpy as jnp
import numpy as np

from disco_diffdock_tpu.nn import basic, batchnorm, cg, conv, irreps, sh, tensor_product
from disco_diffdock_tpu.graphs.containers import ListEdges


def rand_rot(seed=0):
    rng = np.random.RandomState(seed)
    return cg._random_rotation(rng).astype(np.float32)


def irreps_rep_matrix(ir: irreps.Irreps, R: np.ndarray) -> np.ndarray:
    """Block-diagonal action of rotation R (det=+1) on a feature vector."""
    blocks = []
    for mi in ir:
        D = cg.wigner_d(mi.ir.l)(R)
        for _ in range(mi.mul):
            blocks.append(D)
    out = np.zeros((ir.dim, ir.dim))
    i = 0
    for D in blocks:
        d = D.shape[0]
        out[i : i + d, i : i + d] = D
        i += d
    return out.astype(np.float32)


class TestIrreps:
    def test_parse(self):
        ir = irreps.Irreps("24x0e + 6x1o + 6x1e + 24x0o")
        assert ir.dim == 24 + 18 + 18 + 24
        assert ir.mul_dict() == {"0e": 24, "1o": 6, "1e": 6, "0o": 24}

    def test_sh_irreps(self):
        assert str(irreps.spherical_harmonics_irreps(2)) == "1x0e+1x1o+1x2e"


class TestSH:
    def test_component_norm(self):
        v = np.random.RandomState(0).randn(10, 3).astype(np.float32)
        Y = np.asarray(sh.spherical_harmonics(jnp.asarray(v), 3))
        for l in range(4):
            blk = Y[:, l * l : (l + 1) * (l + 1)]
            np.testing.assert_allclose((blk**2).sum(-1), 2 * l + 1, rtol=1e-4)

    def test_equivariance(self):
        R = rand_rot(1)
        v = np.random.RandomState(2).randn(20, 3).astype(np.float32)
        for l in range(4):
            D = cg.wigner_d(l)(R).astype(np.float32)
            Y_rot = sh.sh_block_numpy(v @ R.T, l)
            Y = sh.sh_block_numpy(v, l)
            np.testing.assert_allclose(Y_rot, Y @ D.T, atol=1e-4)

    def test_jnp_matches_numpy(self):
        v = np.random.RandomState(3).randn(7, 3).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(sh.spherical_harmonics(jnp.asarray(v), 3)),
            sh.sh_numpy(v, 3),
            atol=1e-5,
        )

    def test_vec_irrep_roundtrip(self):
        v = jnp.asarray([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(sh.irrep_to_vec(sh.vec_to_irrep(v)), v)
        # l=1 SH of v is sqrt(3) * normalized v in (y,z,x) layout
        Y = sh.spherical_harmonics(v, 1)[..., 1:]
        np.testing.assert_allclose(
            np.asarray(sh.irrep_to_vec(Y)),
            np.sqrt(3) * np.asarray(v) / np.linalg.norm(v),
            rtol=1e-5,
        )


class TestWeightedTP:
    def test_weight_numel_matches_reference_fast_path(self):
        # reference FasterTensorProduct weight shapes for ns=24, nv=6 lmax1
        # (tensor_layers.py:57-63): 0e:(30,24) 1o:(36,6) 1e:(36,6) 0o:(30,24)
        tp = tensor_product.WeightedTensorProduct(
            "24x0e+6x1o+6x1e+24x0o", "1x0e+1x1o", "24x0e+6x1o+6x1e+24x0o"
        )
        assert tp.fan_in == [24 + 6, 24 + 6 + 6, 6 + 6 + 24, 6 + 24]
        assert tp.weight_numel == 30 * 24 + 36 * 6 + 36 * 6 + 30 * 24

    def test_equivariance_lmax1(self):
        self._equivariance("24x0e+6x1o+6x1e+24x0o", 1, "24x0e+6x1o+6x1e+24x0o")

    def test_equivariance_lmax2(self):
        self._equivariance("8x0e+4x1o+4x2e+4x1e+4x2o+8x0o", 2, "8x0e+4x1o+4x2e")

    def _equivariance(self, in_ir, sh_lmax, out_ir):
        rng = np.random.RandomState(7)
        tp = tensor_product.WeightedTensorProduct(
            in_ir, str(irreps.spherical_harmonics_irreps(sh_lmax)), out_ir
        )
        E = 5
        x = rng.randn(E, irreps.Irreps(in_ir).dim).astype(np.float32)
        vec = rng.randn(E, 3).astype(np.float32)
        w = rng.randn(E, tp.weight_numel).astype(np.float32)
        R = rand_rot(8)

        Din = irreps_rep_matrix(irreps.Irreps(in_ir), R)
        Dout = irreps_rep_matrix(irreps.Irreps(out_ir), R)

        y = np.asarray(tp(jnp.asarray(x), sh.spherical_harmonics(jnp.asarray(vec), sh_lmax), jnp.asarray(w)))
        y_rot = np.asarray(
            tp(
                jnp.asarray(x @ Din.T),
                sh.spherical_harmonics(jnp.asarray(vec @ R.T), sh_lmax),
                jnp.asarray(w),
            )
        )
        np.testing.assert_allclose(y_rot, y @ Dout.T, atol=2e-4)

    def test_matches_reference_fast_path_math(self):
        """Scalar-only sanity: out_0e = [x_0e*sh_0, (x_1o . sh_1)/sqrt(3)] @ W/sqrt(fan)."""
        tp = tensor_product.WeightedTensorProduct("2x0e+1x1o", "1x0e+1x1o", "1x0e")
        x = jnp.asarray([[1.0, 2.0, 0.1, 0.2, 0.3]])
        vecn = jnp.asarray([[0.0, 0.0, 1.0]])  # +z
        shv = sh.spherical_harmonics(vecn, 1)  # [1, 0, sqrt3, 0]
        w = jnp.asarray([[1.0, 0.0, 0.0]])  # pick x_0e[0] * sh_0
        out = tp(x, shv, w)
        np.testing.assert_allclose(out, [[1.0 / np.sqrt(3)]], rtol=1e-5)
        w = jnp.asarray([[0.0, 0.0, 1.0]])  # pick the dot path
        out = tp(x, shv, w)
        # x_1o=(0.1,0.2,0.3) in (y,z,x); sh_1=(0,sqrt3,0) -> dot/sqrt3 = 0.2
        np.testing.assert_allclose(out, [[0.2 / np.sqrt(3)]], rtol=1e-5)


class TestFullTP:
    def test_output_irreps(self):
        ftp = tensor_product.FullTensorProduct("1x0e+1x1o", "1x2e")
        assert str(ftp.irreps_out) == "1x2e+1x1o+1x2o+1x3o"

    def test_equivariance(self):
        rng = np.random.RandomState(9)
        ftp = tensor_product.FullTensorProduct("1x0e+1x1o", "1x2e")
        R = rand_rot(10)
        v1 = rng.randn(6, 3).astype(np.float32)
        v2 = rng.randn(6, 3).astype(np.float32)
        sh1 = sh.spherical_harmonics(jnp.asarray(v1), 1)
        sh2 = sh.spherical_harmonics(jnp.asarray(v2), 2)[..., 4:]
        y = np.asarray(ftp(sh1, sh2))
        sh1r = sh.spherical_harmonics(jnp.asarray(v1 @ R.T), 1)
        sh2r = sh.spherical_harmonics(jnp.asarray(v2 @ R.T), 2)[..., 4:]
        yr = np.asarray(ftp(sh1r, sh2r))
        Dout = irreps_rep_matrix(ftp.irreps_out, R)
        np.testing.assert_allclose(yr, y @ Dout.T, atol=1e-4)


class TestBatchNorm:
    def test_masked_invariance(self):
        """Padded slots must not change the statistics."""
        rng = np.random.RandomState(11)
        ir = "4x0e+2x1o"
        bn = batchnorm.MaskedIrrepsBatchNorm(ir)
        x = rng.randn(2, 6, 10).astype(np.float32)
        mask = np.ones((2, 6), bool)
        params = bn.init(jax.random.PRNGKey(0), x, jnp.asarray(mask))
        y0, _ = bn.apply(params, jnp.asarray(x), jnp.asarray(mask), mutable=["batch_stats"])

        xp = np.concatenate([x, 100 * rng.randn(2, 3, 10).astype(np.float32)], 1)
        mp = np.concatenate([mask, np.zeros((2, 3), bool)], 1)
        y1, _ = bn.apply(params, jnp.asarray(xp), jnp.asarray(mp), mutable=["batch_stats"])
        np.testing.assert_allclose(y0, np.asarray(y1)[:, :6], atol=1e-5)

    def test_scalar_normalization(self):
        rng = np.random.RandomState(12)
        bn = batchnorm.MaskedIrrepsBatchNorm("3x0e")
        x = (rng.randn(4, 8, 3) * 5 + 2).astype(np.float32)
        mask = jnp.ones((4, 8), bool)
        params = bn.init(jax.random.PRNGKey(0), x, mask)
        y, _ = bn.apply(params, jnp.asarray(x), mask, mutable=["batch_stats"])
        y = np.asarray(y).reshape(-1, 3)
        np.testing.assert_allclose(y.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(y.std(0), 1.0, atol=1e-2)

    def test_equivariance(self):
        """BN commutes with rotations (no mean subtraction for l>0)."""
        rng = np.random.RandomState(13)
        ir = irreps.Irreps("2x0e+2x1o")
        bn = batchnorm.MaskedIrrepsBatchNorm(str(ir))
        x = rng.randn(2, 5, ir.dim).astype(np.float32)
        mask = jnp.ones((2, 5), bool)
        R = rand_rot(14)
        D = irreps_rep_matrix(ir, R)
        params = bn.init(jax.random.PRNGKey(0), x, mask)
        y, _ = bn.apply(params, jnp.asarray(x), mask, mutable=["batch_stats"])
        y_rot, _ = bn.apply(params, jnp.asarray(x @ D.T), mask, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y_rot), np.asarray(y) @ D.T, atol=1e-4)


class TestConvLayer:
    def test_equivariance_and_masking(self):
        rng = np.random.RandomState(15)
        B, N, E = 2, 6, 10
        in_ir, out_ir = "4x0e+2x1o", "4x0e+2x1o+2x1e"
        pos = rng.randn(B, N, 3).astype(np.float32) * 3
        feat = rng.randn(B, N, irreps.Irreps(in_ir).dim).astype(np.float32)
        src = rng.randint(0, N, (B, E)).astype(np.int32)
        dst = rng.randint(0, N, (B, E)).astype(np.int32)
        mask = np.ones((B, E), bool)
        mask[:, -2:] = False
        edges = ListEdges(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask))
        e_attr = rng.randn(B, E, 8).astype(np.float32)

        # n_edge_features counts the FULL assembled width: base (8) +
        # receiver scalars (4) + supplier scalars (4)
        layer = conv.TPConvLayer(
            in_irreps=in_ir, sh_irreps="1x0e+1x1o", out_irreps=out_ir,
            n_edge_features=16, batch_norm=False, residual=True,
        )

        def run(pos_, feat_):
            vec = jnp.take_along_axis(pos_, edges.dst[..., None], 1) - jnp.take_along_axis(
                pos_, edges.src[..., None], 1
            )
            e_sh = sh.spherical_harmonics(vec, 1)
            blocks = [conv.ConvBlock(edges, "n", "n", jnp.asarray(e_attr), e_sh)]
            attrs = {"n": feat_}
            masks = {"n": jnp.ones((B, N), bool)}
            return layer.init_with_output(jax.random.PRNGKey(0), attrs, masks, blocks)[0]["n"]

        y = np.asarray(run(jnp.asarray(pos), jnp.asarray(feat)))
        R = rand_rot(16)
        Din = irreps_rep_matrix(irreps.Irreps(in_ir), R)
        Dout = irreps_rep_matrix(irreps.Irreps(out_ir), R)
        y_rot = np.asarray(run(jnp.asarray(pos @ R.T), jnp.asarray(feat @ Din.T)))
        np.testing.assert_allclose(y_rot, y @ Dout.T, atol=2e-4)

    def test_masked_edges_ignored(self):
        rng = np.random.RandomState(17)
        B, N, E = 1, 4, 6
        feat = rng.randn(B, N, 4).astype(np.float32)
        pos = rng.randn(B, N, 3).astype(np.float32)
        e_attr = rng.randn(B, E, 5).astype(np.float32)
        src = np.array([[0, 1, 2, 3, 0, 1]], np.int32)
        dst = np.array([[1, 2, 3, 0, 2, 3]], np.int32)
        layer = conv.TPConvLayer(
            in_irreps="4x0e", sh_irreps="1x0e+1x1o", out_irreps="4x0e+2x1o",
            n_edge_features=13, batch_norm=False,
        )

        def run(m):
            edges = ListEdges(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(m))
            vec = jnp.take_along_axis(jnp.asarray(pos), edges.dst[..., None], 1) - \
                jnp.take_along_axis(jnp.asarray(pos), edges.src[..., None], 1)
            blocks = [conv.ConvBlock(edges, "n", "n", jnp.asarray(e_attr), sh.spherical_harmonics(vec, 1))]
            return layer.init_with_output(
                jax.random.PRNGKey(0), {"n": jnp.asarray(feat)}, {"n": jnp.ones((B, N), bool)}, blocks
            )[0]["n"]

        m_valid = np.array([[True, True, True, True, False, False]])
        y_masked = run(m_valid)
        # same graph with the invalid edges truly absent but garbage attrs
        e_attr[:, 4:] = 1e6
        y_masked2 = run(m_valid)
        np.testing.assert_allclose(np.asarray(y_masked), np.asarray(y_masked2), atol=1e-5)


class TestBasic:
    def test_gumbel_one_hot(self):
        logits = jnp.asarray(np.random.RandomState(18).randn(3, 10).astype(np.float32))
        y = basic.gumbel_softmax(jax.random.PRNGKey(0), logits, 0.01)
        np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, atol=1e-4)
        assert np.allclose(np.sort(np.asarray(y), axis=-1)[:, -1], 1.0, atol=1e-4)

    def test_gumbel_mask(self):
        logits = jnp.zeros((4, 6))
        mask = jnp.asarray([[True, True, False, False, False, False]] * 4)
        y = basic.gumbel_softmax(jax.random.PRNGKey(1), logits, 0.5, mask)
        assert np.asarray(y)[:, 2:].max() < 1e-4

    def test_gaussian_smearing(self):
        gs = basic.GaussianSmearing(0.0, 5.0, 50)
        out = gs.apply({}, jnp.asarray([0.0, 2.5, 5.0]))
        assert out.shape == (3, 50)
        np.testing.assert_allclose(np.asarray(out)[0, 0], 1.0, atol=1e-5)

    def test_atom_encoder(self):
        enc = basic.AtomEncoder(emb_dim=8, categorical_dims=[5, 3], additional_dim=4)
        x = jnp.concatenate(
            [jnp.asarray([[1, 2], [0, 1]], jnp.float32), jnp.ones((2, 4))], axis=-1
        )
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 8)

    def test_old_atom_encoder_torch_parity(self):
        """OldAtomEncoder == reference models/layers.py:81-116 semantics:
        categorical sum + scalar linear ADDED, ESM fused via a LATE linear
        over [emb, lm] (vs the new encoder's single joint linear)."""
        import torch

        rng = np.random.RandomState(0)
        cat_dims, scalar_dim, lm_dim, emb_dim, n = [5, 3], 4, 6, 8, 7
        enc = basic.OldAtomEncoder(emb_dim=emb_dim, categorical_dims=cat_dims,
                                   scalar_dim=scalar_dim, lm_embedding_dim=lm_dim)
        codes = rng.randint(0, 3, size=(n, 2)).astype(np.float32)
        extras = rng.randn(n, scalar_dim + lm_dim).astype(np.float32)
        x = jnp.asarray(np.concatenate([codes, extras], -1))
        v = enc.init(jax.random.PRNGKey(0), x)
        ours = np.asarray(enc.apply(v, x))

        p = v["params"]
        emb = 0.0
        for i in range(2):
            table = torch.from_numpy(np.asarray(p[f"Embed_{i}"]["embedding"]))
            emb = emb + table[torch.from_numpy(codes[:, i].astype(np.int64))]
        lin_w = torch.from_numpy(np.asarray(p["Dense_0"]["kernel"]))
        lin_b = torch.from_numpy(np.asarray(p["Dense_0"]["bias"]))
        emb = emb + torch.from_numpy(extras[:, :scalar_dim]) @ lin_w + lin_b
        lm_w = torch.from_numpy(np.asarray(p["Dense_1"]["kernel"]))
        lm_b = torch.from_numpy(np.asarray(p["Dense_1"]["bias"]))
        theirs = torch.cat(
            [emb, torch.from_numpy(extras[:, scalar_dim:])], -1) @ lm_w + lm_b
        np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-5)
