"""Clebsch-Gordan tensors for the real SH basis of ``sh.py``, derived
numerically at import time (host-side numpy) and cached in-process.

Replacing e3nn's wigner tables (used implicitly by
``o3.FullyConnectedTensorProduct`` / ``o3.FullTensorProduct``,
models/tensor_layers.py:137, models/score_model.py:152): instead of porting
conventions, the equivariant bilinear map l1 (x) l2 -> l3 is found as the
nullspace of rotation-equivariance constraints built from Wigner-D matrices
*fit from our own SH basis* -- guaranteeing basis consistency by construction.

Normalization: ||C||_F = sqrt(2*l3+1) ('component' normalization -- unit
component variance in = unit component variance out), which reproduces the
reference FasterTensorProduct's 1/sqrt(3) dot and 1/sqrt(2) cross factors
exactly (models/tensor_layers.py:75-81).

Sign convention: the overall sign of each C is arbitrary (absorbed into
learned weights); we fix it deterministically (first nonzero entry positive).
"""
from __future__ import annotations

import functools

import numpy as np

from .sh import sh_block_numpy

_LMAX = 3


def _fit_points(rng: np.random.RandomState, k: int) -> np.ndarray:
    v = rng.randn(k, 3)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@functools.lru_cache(maxsize=None)
def wigner_d(l: int, seed: int = 0) -> "function":
    """Return a function R (3x3) -> D_l(R) ((2l+1)x(2l+1)) for our basis.

    Fit by least squares from SH evaluations: Y_l(R n) = D_l(R) Y_l(n).
    """
    rng = np.random.RandomState(100 + seed)
    pts = _fit_points(rng, 4 * (2 * l + 1))
    Y = sh_block_numpy(pts, l)  # (K, 2l+1)
    pinv = np.linalg.pinv(Y)

    def D(R: np.ndarray) -> np.ndarray:
        YR = sh_block_numpy(pts @ R.T, l)  # (K, 2l+1)
        # Y(Rn)^T = D @ Y(n)^T  =>  D = (pinv @ YR)^T
        return (pinv @ YR).T

    return D


def _random_rotation(rng: np.random.RandomState) -> np.ndarray:
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    r, i, j, k = q
    return np.array(
        [
            [1 - 2 * (j * j + k * k), 2 * (i * j - k * r), 2 * (i * k + j * r)],
            [2 * (i * j + k * r), 1 - 2 * (i * i + k * k), 2 * (j * k - i * r)],
            [2 * (i * k - j * r), 2 * (j * k + i * r), 1 - 2 * (i * i + j * j)],
        ]
    )


@functools.lru_cache(maxsize=None)
def cg_tensor(l1: int, l2: int, l3: int) -> np.ndarray:
    """Real-basis CG tensor C[(2l1+1), (2l2+1), (2l3+1)], ||C||_F = sqrt(2l3+1).

    Zero tensor if the triangle inequality fails.
    """
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return np.zeros((d1, d2, d3))
    assert max(l1, l2, l3) <= _LMAX, f"CG beyond l={_LMAX} not supported"

    rng = np.random.RandomState(7)
    D1f, D2f, D3f = wigner_d(l1), wigner_d(l2), wigner_d(l3)
    rows = []
    for _ in range(3):  # 3 random rotations over-determine the 1-dim nullspace
        R = _random_rotation(rng)
        D1, D2, D3 = D1f(R), D2f(R), D3f(R)
        # constraint: sum_ab C[a,b,c] D1[a,p] D2[b,q] = sum_r D3[c,r] C[p,q,r]
        # vectorized: (D1^T (x) D2^T (x) I - I (x) I (x) D3) vec(C) = 0
        M = np.einsum("ap,bq,cr->pqrabc", D1, D2, np.eye(d3)).reshape(d1 * d2 * d3, -1)
        N = np.einsum("ap,bq,rc->pqrabc", np.eye(d1), np.eye(d2), D3).reshape(
            d1 * d2 * d3, -1
        )
        rows.append(M - N)
    A = np.concatenate(rows, axis=0)
    _, s, Vt = np.linalg.svd(A)
    # nullspace must be exactly 1-dimensional
    assert s[-1] < 1e-8, (l1, l2, l3, s[-3:])
    assert len(s) == 1 or s[-2] > 1e-4, (l1, l2, l3, s[-3:])
    C = Vt[-1].reshape(d1, d2, d3)
    # deterministic sign: first entry with |.| > 1e-6 is positive
    flat = C.ravel()
    first = flat[np.abs(flat) > 1e-6][0]
    C = C * np.sign(first)
    C = C / np.linalg.norm(C) * np.sqrt(d3)
    # clean numerical noise for exactness of simple paths (dot, cross, etc.)
    C[np.abs(C) < 1e-10] = 0.0
    return C
