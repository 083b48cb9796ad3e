"""Tests for the e3nn-basis replica (interop/e3nn_basis.py).

Every property of e3nn's conventions that is verifiable in this environment
is asserted here:
  * SU(2) CG textbook values and orthogonality;
  * e3nn's generated spherical-harmonic polynomial table for l <= 2
    (hard-coded from e3nn o3/_spherical_harmonics.py forms);
  * wigner_3j realness/normalization/permutation symmetry/equivariance in the
    e3nn basis;
  * the reference-code sign anchor: the lmax=1 tensors reproduce the
    reference's FasterTensorProduct math (models/tensor_layers.py:75-87),
    which the reference treats as interchangeable with e3nn's
    FullyConnectedTensorProduct.
"""
import numpy as np
import pytest

from disco_diffdock_tpu.interop.e3nn_basis import (
    path_sign,
    sh_e3nn,
    su2_clebsch_gordan,
    wigner_3j,
)

TRIPLES = [
    (l1, l2, l3)
    for l1 in range(4)
    for l2 in range(4)
    for l3 in range(4)
    if abs(l1 - l2) <= l3 <= l1 + l2
]


def test_su2_textbook_values():
    C = su2_clebsch_gordan(1, 1, 0)
    s3 = 1 / np.sqrt(3)
    assert np.isclose(C[2, 0, 0], s3)
    assert np.isclose(C[1, 1, 0], -s3)
    assert np.isclose(C[0, 2, 0], s3)
    # <1/2-like integer check: <1 1 1 0 | 2 1> = 1/sqrt(2)
    C = su2_clebsch_gordan(1, 1, 2)
    assert np.isclose(C[2, 1, 3], 1 / np.sqrt(2))


def test_su2_orthogonality():
    for (l1, l2, l3) in [(1, 1, 2), (2, 1, 2), (2, 2, 3)]:
        C = su2_clebsch_gordan(l1, l2, l3)
        G = np.einsum("abc,abd->cd", C, C)
        np.testing.assert_allclose(G, np.eye(2 * l3 + 1), atol=1e-12)


def test_sh_e3nn_polynomial_table():
    """e3nn's generated polynomials (o3/_spherical_harmonics.py), component
    normalization: l=1 = sqrt(3)*(x,y,z); l=2 = (sqrt(15)xz, sqrt(15)xy,
    sqrt(5)/2*(3y^2-1), sqrt(15)yz, sqrt(15)/2*(z^2-x^2))."""
    rng = np.random.RandomState(0)
    v = rng.randn(64, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    got = sh_e3nn(v, 2)
    np.testing.assert_allclose(got[:, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(got[:, 1], np.sqrt(3) * x, atol=1e-12)
    np.testing.assert_allclose(got[:, 2], np.sqrt(3) * y, atol=1e-12)
    np.testing.assert_allclose(got[:, 3], np.sqrt(3) * z, atol=1e-12)
    np.testing.assert_allclose(got[:, 4], np.sqrt(15) * x * z, atol=1e-11)
    np.testing.assert_allclose(got[:, 5], np.sqrt(15) * x * y, atol=1e-11)
    np.testing.assert_allclose(
        got[:, 6], np.sqrt(5) / 2 * (3 * y * y - 1), atol=1e-11
    )
    np.testing.assert_allclose(got[:, 7], np.sqrt(15) * y * z, atol=1e-11)
    np.testing.assert_allclose(
        got[:, 8], np.sqrt(15) / 2 * (z * z - x * x), atol=1e-11
    )


def _wigner_d_e3nn(l: int, R: np.ndarray) -> np.ndarray:
    """D_l(R) in the e3nn basis, fit from sh_e3nn evaluations."""
    rng = np.random.RandomState(17 + l)
    pts = rng.randn(6 * (2 * l + 1), 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    lo = l * l
    Y = sh_e3nn(pts, l)[:, lo:]
    YR = sh_e3nn(pts @ R.T, l)[:, lo:]
    D, _, _, _ = np.linalg.lstsq(Y, YR, rcond=None)
    assert np.abs(Y @ D - YR).max() < 1e-9
    return D.T


def _rand_rot(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    r, i, j, k = q
    return np.array([
        [1 - 2 * (j * j + k * k), 2 * (i * j - k * r), 2 * (i * k + j * r)],
        [2 * (i * j + k * r), 1 - 2 * (i * i + k * k), 2 * (j * k - i * r)],
        [2 * (i * k - j * r), 2 * (j * k + i * r), 1 - 2 * (i * i + j * j)],
    ])


@pytest.mark.parametrize("triple", TRIPLES)
def test_wigner_3j_normalized_and_equivariant(triple):
    l1, l2, l3 = triple
    C = wigner_3j(l1, l2, l3)
    assert np.isclose(np.linalg.norm(C), 1.0)
    rng = np.random.RandomState(5)
    for _ in range(2):
        R = _rand_rot(rng)
        D1 = _wigner_d_e3nn(l1, R)
        D2 = _wigner_d_e3nn(l2, R)
        D3 = _wigner_d_e3nn(l3, R)
        rotated = np.einsum("abc,ai,bj,ck->ijk", C, D1, D2, D3)
        np.testing.assert_allclose(rotated, C, atol=1e-8)


def test_wigner_3j_permutation_symmetry():
    """3j symbols: invariant under cyclic permutation; odd permutation gives
    a factor (-1)^(l1+l2+l3)."""
    for (l1, l2, l3) in [(1, 1, 2), (1, 2, 3), (2, 2, 2), (1, 1, 1), (0, 1, 1)]:
        C = wigner_3j(l1, l2, l3)
        np.testing.assert_allclose(
            C, np.einsum("bca->abc", wigner_3j(l2, l3, l1)), atol=1e-10
        )
        sign = (-1) ** (l1 + l2 + l3)
        np.testing.assert_allclose(
            C, sign * np.einsum("bac->abc", wigner_3j(l2, l1, l3)), atol=1e-10
        )


def test_faster_tensor_product_anchor():
    """The lmax=1 family must match the reference FasterTensorProduct math
    (models/tensor_layers.py:75-87): +dot/sqrt(3), +cross/sqrt(2),
    +scalar-mult -- the real-code anchor for e3nn's sign conventions."""
    eye = np.eye(3)
    eps = np.zeros((3, 3, 3))
    eps[0, 1, 2] = eps[1, 2, 0] = eps[2, 0, 1] = 1
    eps[0, 2, 1] = eps[2, 1, 0] = eps[1, 0, 2] = -1
    np.testing.assert_allclose(wigner_3j(0, 0, 0), np.ones((1, 1, 1)), atol=1e-12)
    # in 0e x sh 1o -> 1o : identity / sqrt(3)
    np.testing.assert_allclose(
        wigner_3j(0, 1, 1)[0], eye / np.sqrt(3), atol=1e-12
    )
    # in 1o x sh 0e -> 1o : identity / sqrt(3)
    np.testing.assert_allclose(
        wigner_3j(1, 0, 1)[:, 0], eye / np.sqrt(3), atol=1e-12
    )
    # in 1o x sh 1o -> 0e : dot / sqrt(3)  (w3j normalized: /sqrt(3) again)
    np.testing.assert_allclose(
        wigner_3j(1, 1, 0)[..., 0], eye / np.sqrt(3), atol=1e-12
    )
    # in 1o x sh 1o -> 1e : +cross / sqrt(6)
    np.testing.assert_allclose(wigner_3j(1, 1, 1), eps / np.sqrt(6), atol=1e-12)


@pytest.mark.parametrize("triple", TRIPLES)
def test_path_sign_well_defined(triple):
    s = path_sign(*triple)  # internal asserts: |cos| == 1
    assert s in (1.0, -1.0)


def test_path_sign_lmax1_family_positive():
    """Our cg.py reproduces FasterTensorProduct bit-for-bit (test_nn.py), so
    every lmax=1-family sign vs e3nn must be +1."""
    for triple in [(0, 0, 0), (0, 1, 1), (1, 0, 1), (1, 1, 0), (1, 1, 1)]:
        assert path_sign(*triple) == 1.0
