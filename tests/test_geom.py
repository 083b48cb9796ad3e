"""Unit tests for the diffusion/geometry math core (SURVEY.md section 4a)."""
import jax
import jax.numpy as jnp
import numpy as np

from disco_diffdock_tpu.geom import (
    conformer,
    diffusion,
    kabsch,
    rotations,
    so3,
    torsion,
    torus,
)


class TestRotations:
    def test_axis_angle_roundtrip(self):
        rng = np.random.RandomState(0)
        v = rng.randn(16, 3).astype(np.float32)
        R = rotations.axis_angle_to_matrix(jnp.asarray(v))
        # orthonormal, det +1
        eye = jnp.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.RandomState(1)
        v = rng.randn(8, 3)
        R_ref = Rotation.from_rotvec(v).as_matrix()
        R = rotations.axis_angle_to_matrix(jnp.asarray(v, dtype=jnp.float32))
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_small_angle(self):
        v = jnp.array([[1e-8, 0, 0], [0.0, 0, 0]])
        R = rotations.axis_angle_to_matrix(v)
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)

    def test_log_map_roundtrip(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.RandomState(2)
        v = Rotation.random(16, random_state=rng).as_rotvec()
        R = rotations.axis_angle_to_matrix(jnp.asarray(v, dtype=jnp.float32))
        v_back = rotations.matrix_to_axis_angle(R)
        np.testing.assert_allclose(v_back, v, atol=5e-3)

    def test_log_map_near_pi(self):
        """Near angle=pi the antisymmetric part vanishes and signs come from
        the symmetric off-diagonals; the relative y/z sign must survive when
        the axis x-component is ~0 (regression: pi about (0,1,-1)/sqrt(2)
        round-tripped to a different rotation)."""
        axes = np.array([
            [0.0, 1.0, -1.0], [0.0, 1.0, 1.0], [1.0, 0.0, -1.0],
            [1.0, -1.0, 0.0], [0.3, -0.9, 0.9], [0.0, 0.0, 1.0],
        ])
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        for ang in (np.pi, np.pi - 1e-4):
            v = jnp.asarray(axes * ang, jnp.float32)
            R = rotations.axis_angle_to_matrix(v)
            v_back = rotations.matrix_to_axis_angle(R)
            R_back = rotations.axis_angle_to_matrix(v_back)
            # at exactly pi the axis SIGN is ambiguous; the rotation is not
            np.testing.assert_allclose(np.asarray(R_back), np.asarray(R),
                                       atol=2e-3)

    def test_random_rotation_uniformish(self):
        R = rotations.random_rotation_matrix(jax.random.PRNGKey(0), (64,))
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-4)


class TestKabsch:
    def test_recovers_known_rotation(self):
        rng = np.random.RandomState(3)
        A = rng.randn(2, 20, 3).astype(np.float32)
        rotv = rng.randn(2, 3).astype(np.float32)
        R_true = np.asarray(rotations.axis_angle_to_matrix(jnp.asarray(rotv)))
        t_true = rng.randn(2, 3).astype(np.float32)
        B = np.einsum("bni,bji->bnj", A, R_true) + t_true[:, None]
        R, t = kabsch.kabsch_align(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(R, R_true, atol=1e-4)
        np.testing.assert_allclose(t, t_true, atol=1e-4)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=3e-3)

    def test_masked_padding_invariance(self):
        rng = np.random.RandomState(4)
        A = rng.randn(1, 10, 3).astype(np.float32)
        B = rng.randn(1, 10, 3).astype(np.float32)
        R0, t0 = kabsch.kabsch_align(jnp.asarray(A), jnp.asarray(B))
        # pad with garbage rows, masked out
        Ap = np.concatenate([A, 100 * rng.randn(1, 6, 3).astype(np.float32)], 1)
        Bp = np.concatenate([B, 100 * rng.randn(1, 6, 3).astype(np.float32)], 1)
        mask = np.concatenate([np.ones((1, 10)), np.zeros((1, 6))], 1)
        R1, t1 = kabsch.kabsch_align(jnp.asarray(Ap), jnp.asarray(Bp), jnp.asarray(mask))
        np.testing.assert_allclose(R0, R1, atol=1e-4)
        np.testing.assert_allclose(t0, t1, atol=1e-4)

    def test_reflection_fix(self):
        # mirrored point cloud must still produce a proper rotation
        rng = np.random.RandomState(5)
        A = rng.randn(1, 12, 3).astype(np.float32)
        B = A * np.array([1.0, 1.0, -1.0])
        R, t = kabsch.kabsch_align(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=3e-3)


class TestTorsion:
    def _chain(self, n=8):
        # a linear chain along x: bonds i -- i+1
        pos = np.zeros((n, 3), dtype=np.float32)
        pos[:, 0] = np.arange(n)
        pos[:, 1] = 0.1 * np.sin(np.arange(n))  # break collinearity
        return pos

    def test_preserves_bond_lengths(self):
        n = 8
        pos = self._chain(n)
        # rotatable bond (2, 3): atoms >= 3 rotate (v-side moves)
        tor_edges = np.array([[2, 3]], dtype=np.int32)
        mask_rotate = np.zeros((1, n), dtype=bool)
        mask_rotate[0, 3:] = True
        upd = np.array([0.7], dtype=np.float32)
        new = torsion.apply_torsion_updates(
            jnp.asarray(pos), jnp.asarray(tor_edges), jnp.asarray(mask_rotate), jnp.asarray(upd)
        )
        d_old = np.linalg.norm(np.diff(pos, axis=0), axis=1)
        d_new = np.linalg.norm(np.diff(np.asarray(new), axis=0), axis=1)
        np.testing.assert_allclose(d_new, d_old, atol=1e-5)
        # non-rotated side unchanged
        np.testing.assert_allclose(new[:3], pos[:3], atol=1e-6)

    def test_matches_reference_semantics(self):
        """Mirror of utils/torsion.py:48-68 (numpy single-graph loop)."""
        from scipy.spatial.transform import Rotation as Rot

        rng = np.random.RandomState(6)
        n = 10
        pos = rng.randn(n, 3).astype(np.float32) * 2
        tor_edges = np.array([[1, 2], [5, 6]], dtype=np.int32)
        mask_rotate = np.zeros((2, n), dtype=bool)
        mask_rotate[0, 2:5] = True
        mask_rotate[1, 6:] = True
        upd = rng.uniform(-np.pi, np.pi, 2).astype(np.float32)

        ref = pos.copy()
        for r, (u, v) in enumerate(tor_edges):
            rot_vec = ref[u] - ref[v]
            rot_vec = rot_vec * upd[r] / np.linalg.norm(rot_vec)
            rot_mat = Rot.from_rotvec(rot_vec).as_matrix()
            ref[mask_rotate[r]] = (ref[mask_rotate[r]] - ref[v]) @ rot_mat.T + ref[v]

        new = torsion.apply_torsion_updates(
            jnp.asarray(pos), jnp.asarray(tor_edges), jnp.asarray(mask_rotate), jnp.asarray(upd)
        )
        np.testing.assert_allclose(new, ref, atol=1e-4)

    def test_padded_bonds_are_identity(self):
        n = 6
        pos = self._chain(n)
        tor_edges = np.array([[1, 2], [0, 0]], dtype=np.int32)
        mask_rotate = np.zeros((2, n), dtype=bool)
        mask_rotate[0, 2:] = True
        mask_rotate[1, :] = True  # garbage, must be ignored
        upd = np.array([0.5, 99.0], dtype=np.float32)
        bond_mask = np.array([True, False])
        new = torsion.apply_torsion_updates(
            jnp.asarray(pos),
            jnp.asarray(tor_edges),
            jnp.asarray(mask_rotate),
            jnp.asarray(upd),
            jnp.asarray(bond_mask),
        )
        ref = torsion.apply_torsion_updates(
            jnp.asarray(pos),
            jnp.asarray(tor_edges[:1]),
            jnp.asarray(mask_rotate[:1]),
            jnp.asarray(upd[:1]),
        )
        np.testing.assert_allclose(new, ref, atol=1e-6)


class TestSO3:
    def test_score_norm_positive_and_monotonicish(self):
        eps = jnp.asarray([0.02, 0.1, 0.5, 1.5])
        sn = so3.score_norm(eps)
        assert np.all(np.asarray(sn) > 0)
        # at small eps the score norm is large (sharp density)
        assert sn[0] > sn[-1]

    def test_small_sigma_score_matches_gaussian(self):
        # For small eps, IGSO3 ~ Gaussian with variance-like eps^2:
        # score(omega) ~ -omega/eps^2 + curvature corrections; check sign/scale.
        eps = jnp.asarray(0.05)
        vec = jnp.asarray([0.08, 0.0, 0.0])
        s = so3.score_vec(eps, vec)
        expected = -0.08 / 0.05**2
        assert np.sign(s[0]) == np.sign(expected)
        assert 0.3 < abs(s[0] / expected) < 3.0

    def test_sampling_moments(self):
        key = jax.random.PRNGKey(0)
        eps = jnp.full((4000,), 0.3)
        om = so3.sample(key, eps)
        om = np.asarray(om)
        assert np.all(om >= 0) and np.all(om <= np.pi)
        # expected angle approx sqrt(3)*eps for small eps (3D Gaussian norm)
        assert 0.3 < om.mean() < 0.8

    def test_sample_vec_shape(self):
        v = so3.sample_vec(jax.random.PRNGKey(1), jnp.full((7,), 0.5))
        assert v.shape == (7, 3)


class TestTorus:
    def test_score_matches_gaussian_small_sigma(self):
        # for sigma << pi the wrapped Gaussian is a Gaussian: score = -x/sigma^2
        sigma = jnp.asarray(0.1)
        x = jnp.asarray(0.15)
        s = torus.score(x, sigma)
        np.testing.assert_allclose(s, -0.15 / 0.01, rtol=0.05)

    def test_score_odd(self):
        sigma = jnp.asarray(0.5)
        np.testing.assert_allclose(
            torus.score(jnp.asarray(0.7), sigma), -torus.score(jnp.asarray(-0.7), sigma), rtol=1e-5
        )

    def test_score_norm_matches_gaussian(self):
        # small sigma: E[score^2] = E[x^2]/sigma^4 = 1/sigma^2
        sigma = jnp.asarray([0.05, 0.1, 0.2])
        sn = torus.score_norm(sigma)
        np.testing.assert_allclose(sn, 1 / sigma**2, rtol=0.1)

    def test_sample_wraps(self):
        s = torus.sample(jax.random.PRNGKey(0), jnp.full((1000,), 3.0))
        s = np.asarray(s)
        assert np.all(s >= -np.pi) and np.all(s <= np.pi)


class TestDiffusion:
    def test_t_to_sigma_endpoints(self):
        sched = diffusion.SigmaSchedule()
        tr, rot, tor = sched.t_to_sigma(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0))
        np.testing.assert_allclose([tr, rot, tor], [0.1, 0.03, 0.03], rtol=1e-5)
        tr, rot, tor = sched.t_to_sigma(jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(1.0))
        np.testing.assert_allclose([tr, rot, tor], [19.0, 1.55, 3.14], rtol=1e-5)

    def test_t_schedule(self):
        t = diffusion.get_t_schedule(20)
        assert len(t) == 20 and t[0] == 1.0 and t[-1] > 0

    def test_sinusoidal_embedding_matches_reference_formula(self):
        t = jnp.asarray([0.0, 0.5, 1.0])
        emb = diffusion.sinusoidal_embedding(1000 * t, 32)
        assert emb.shape == (3, 32)
        np.testing.assert_allclose(emb[0, :16], 0.0, atol=1e-6)  # sin(0)
        np.testing.assert_allclose(emb[0, 16:], 1.0, atol=1e-6)  # cos(0)


class TestConformer:
    def test_rigid_only(self):
        rng = np.random.RandomState(7)
        pos = rng.randn(2, 9, 3).astype(np.float32)
        mask = np.ones((2, 9))
        tr = rng.randn(2, 3).astype(np.float32)
        rot = rng.randn(2, 3).astype(np.float32) * 0.5
        new = conformer.modify_conformer(jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(tr), jnp.asarray(rot))
        # centroid moves exactly by tr
        np.testing.assert_allclose(
            np.asarray(new).mean(1) - pos.mean(1), tr, atol=1e-4
        )
        # rigid: pairwise distances preserved
        d0 = np.linalg.norm(pos[:, :, None] - pos[:, None], axis=-1)
        d1 = np.linalg.norm(np.asarray(new)[:, :, None] - np.asarray(new)[:, None], axis=-1)
        np.testing.assert_allclose(d0, d1, atol=1e-4)

    def test_torsion_does_not_leak_into_rigid(self):
        """After the Kabsch realignment the rigid-frame change is minimized:
        repeating the reference's invariant that modify_conformer aligns the
        flexible pose back onto the rigid pose (diffusion_utils.py:29-31)."""
        rng = np.random.RandomState(8)
        n = 10
        pos = rng.randn(1, n, 3).astype(np.float32) * 2
        mask = np.ones((1, n))
        tor_edges = np.array([[[3, 4]]], dtype=np.int32)
        mask_rotate = np.zeros((1, 1, n), dtype=bool)
        mask_rotate[0, 0, 4:] = True
        upd = np.array([[1.2]], dtype=np.float32)
        zero3 = jnp.zeros((1, 3))
        new = conformer.modify_conformer(
            jnp.asarray(pos), jnp.asarray(mask), zero3, zero3,
            jnp.asarray(upd), jnp.asarray(tor_edges), jnp.asarray(mask_rotate),
        )
        # Kabsch of new onto pos should be ~identity (already aligned)
        R, t = kabsch.kabsch_align(new, jnp.asarray(pos), jnp.asarray(mask))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-3)
        np.testing.assert_allclose(t[0], 0.0, atol=1e-3)
