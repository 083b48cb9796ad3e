"""First-principles numpy replica of e3nn's real-basis Wigner 3j tensors.

Why this exists.  The reference's non-"faster" tensor products
(``o3.FullyConnectedTensorProduct`` in every model's ``final_conv`` /
``tor_bond_conv``, in the sh_lmax=2 AR trunk, and throughout the all-atom
confidence model -- models/tensor_layers.py:137, models/all_atom_score_model.py:26)
contract per-edge weights against e3nn's ``wigner_3j`` tensors.  Importing a
reference checkpoint therefore requires those tensors' exact values
(including signs) so the weights can be re-expressed against this framework's
CG tensors (``nn/cg.py``).  e3nn is not a dependency of this framework, so
its conventions are replicated here from first principles and anchored to
reference code where possible.

Construction.
  1. **e3nn's real SH basis** (:func:`sh_e3nn`): e3nn's generated polynomials
     (o3/_spherical_harmonics.py) are the standard z-principal m-ordered real
     SH evaluated at cyclically permuted coordinates (std X,Y,Z) = (z,x,y) --
     i.e. e3nn's m=0 axis is y; its l=1 block is sqrt(3)*(x,y,z).  We reuse
     ``nn/sh.py`` (standard basis) on the permuted vector; the l<=3 polynomial
     table is asserted against hard-coded e3nn forms in the tests.
  2. **Complex SH** with Condon-Shortley phases, built from the standard real
     SH by the textbook combination (verified against closed forms in tests).
  3. **The unitary change of basis** M_l with sh_e3nn = M_l @ complex_sh is
     solved numerically from the concrete function sets -- no remembered
     matrix conventions enter.
  4. **wigner_3j(l1,l2,l3)**: SU(2) Clebsch-Gordan coefficients (exact Racah
     rationals) conjugated into the real basis through M_l, multiplied by the
     phase ``(-1j)**(l1+l2-l3)`` that makes odd-sum triples real (e3nn's
     ``(-1j)**l`` trick in change_basis_real_to_complex), normalized to unit
     Frobenius norm.  Realness is asserted.

Sign anchoring.  The per-triple sign of a real CG tensor is a convention.
Even-sum triples (l1+l2+l3 even) are fully determined by steps 1-4 with no
freedom.  For odd-sum triples the direction of the realness phase flips the
sign globally; the shipped direction is fixed by a *reference-code* anchor:
with it, the lmax=1 tensors reproduce the reference's hand-written
``FasterTensorProduct`` math (+dot/sqrt(3), +cross/sqrt(2), +scalar-mult,
models/tensor_layers.py:39-116), which the reference uses interchangeably
with e3nn's FullyConnectedTensorProduct -- so e3nn's (1,1,1) tensor must be
the +cross one.  Residual (unverifiable here) assumption: e3nn's
change-of-basis matrix follows the textbook real<->complex SH relation, as
its public source does; ``scripts/verify_torch_import.py`` lets a user with
e3nn installed confirm every tensor directly.

Basis relationship to this framework.  e3nn's basis and ours differ per-l by
D_l(R0) for the single common rotation R0: (x,y,z)->(y,z,x).  Wigner 3j
tensors are invariant under a common rotation of all three slots, so e3nn's
wigner_3j and our ``cg_tensor`` compare *numerically as-is*: the importer
needs no basis-change matrices anywhere, only the per-path scalar

    s(l1,l2,l3) = <cg_tensor(l1,l2,l3), wigner_3j(l1,l2,l3)*sqrt(2l3+1)>

which must be +-1 (CG uniqueness; asserted) and is folded into imported
weights (:mod:`tp_layout`).
"""
from __future__ import annotations

import functools
from fractions import Fraction
from math import factorial

import numpy as np

from ..nn.cg import cg_tensor
from ..nn.sh import sh_block_numpy, sh_numpy

__all__ = [
    "su2_clebsch_gordan",
    "wigner_3j",
    "sh_e3nn",
    "path_sign",
]


def _f(n) -> int:
    n = int(n)
    assert n >= 0
    return factorial(n)


def _su2_cg_coeff(j1: int, m1: int, j2: int, m2: int, j3: int, m3: int) -> float:
    """<j1 m1 j2 m2 | j3 m3> by the Racah closed form (exact rationals)."""
    if m3 != m1 + m2:
        return 0.0
    vmin = max(-j1 + j2 + m3, -j1 + m1, 0)
    vmax = min(j2 + j3 + m1, j3 - j1 + j2, j3 + m3)
    if vmax < vmin:
        return 0.0
    norm2 = (2 * j3 + 1) * Fraction(
        _f(j3 + j1 - j2) * _f(j3 - j1 + j2) * _f(j1 + j2 - j3)
        * _f(j3 + m3) * _f(j3 - m3),
        _f(j1 + j2 + j3 + 1) * _f(j1 - m1) * _f(j1 + m1)
        * _f(j2 - m2) * _f(j2 + m2),
    )
    S = Fraction(0)
    for v in range(vmin, vmax + 1):
        S += (-1) ** (v + j2 + m2) * Fraction(
            _f(j2 + j3 + m1 - v) * _f(j1 - m1 + v),
            _f(v) * _f(j3 - j1 + j2 - v) * _f(j3 + m3 - v) * _f(v + j1 - j2 - m3),
        )
    return float(norm2) ** 0.5 * float(S)


@functools.lru_cache(maxsize=None)
def su2_clebsch_gordan(j1: int, j2: int, j3: int) -> np.ndarray:
    """(2j1+1, 2j2+1, 2j3+1) complex-basis CG, indexed [j+m] (m ascending)."""
    mat = np.zeros((2 * j1 + 1, 2 * j2 + 1, 2 * j3 + 1))
    if not abs(j1 - j2) <= j3 <= j1 + j2:
        return mat
    for m1 in range(-j1, j1 + 1):
        for m2 in range(-j2, j2 + 1):
            m3 = m1 + m2
            if abs(m3) <= j3:
                mat[j1 + m1, j2 + m2, j3 + m3] = _su2_cg_coeff(j1, m1, j2, m2, j3, m3)
    return mat


def sh_e3nn(vec: np.ndarray, lmax: int, normalize: bool = True) -> np.ndarray:
    """e3nn's component-normalized real spherical harmonics, all l <= lmax.

    Standard real SH at cyclically permuted coordinates (see module
    docstring); e.g. l=1 -> sqrt(3)*(x,y,z), l=2 -> (sqrt(15)xz, sqrt(15)xy,
    sqrt(5)/2*(3y^2-1), sqrt(15)yz, sqrt(15)/2*(z^2-x^2)).
    """
    vec = np.asarray(vec, dtype=np.float64)
    permuted = np.stack([vec[..., 2], vec[..., 0], vec[..., 1]], axis=-1)
    return sh_numpy(permuted, lmax, normalize=normalize)


def _complex_sh_std(pts: np.ndarray, l: int) -> np.ndarray:
    """Condon-Shortley complex SH (component normalization, z-principal,
    m = -l..l ascending), built from the standard real SH by the textbook
    relation  Y_l^m = (-1)^m (R_{l,m} + i R_{l,-m})/sqrt(2)  (m>0),
    Y_l^0 = R_{l,0},  Y_l^{-m} = (R_{l,m} - i R_{l,-m})/sqrt(2)."""
    R = sh_block_numpy(pts, l)  # (..., 2l+1), index l+m
    out = np.zeros(R.shape, dtype=np.complex128)
    out[..., l] = R[..., l]
    for m in range(1, l + 1):
        rp, rm = R[..., l + m], R[..., l - m]
        out[..., l + m] = (-1) ** m * (rp + 1j * rm) / np.sqrt(2)
        out[..., l - m] = (rp - 1j * rm) / np.sqrt(2)
    return out


@functools.lru_cache(maxsize=None)
def _real_from_complex(l: int) -> np.ndarray:
    """Unitary M with sh_e3nn_l(v) = M @ complex_sh_e3nn_l(v), solved from
    the concrete function sets (complex SH evaluated at the same permuted
    coordinates as e3nn's real basis)."""
    rng = np.random.RandomState(42 + l)
    pts = rng.randn(8 * (2 * l + 1), 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    permuted = np.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=-1)
    Yc = _complex_sh_std(permuted, l)  # (K, 2l+1)
    Yr = sh_e3nn(pts, l)[:, l * l:].astype(np.complex128)  # (K, 2l+1)
    # Yr = Yc @ M^T  =>  M^T = lstsq(Yc, Yr)
    MT, res, _, _ = np.linalg.lstsq(Yc, Yr, rcond=None)
    M = MT.T
    # exact change of basis: residual ~ 0 and unitary
    assert np.abs(Yc @ MT - Yr).max() < 1e-9, l
    assert np.abs(M @ M.conj().T - np.eye(2 * l + 1)).max() < 1e-9, l
    return M


@functools.lru_cache(maxsize=None)
def wigner_3j(l1: int, l2: int, l3: int) -> np.ndarray:
    """e3nn's real-basis Wigner 3j tensor, unit Frobenius norm.

    Transform of the SU(2) CG through the concrete unitaries M_l
    (real features r = M z  =>  C_real[a,b,c] = sum conj(M1)[a,m1]
    conj(M2)[b,m2] M3[c,m3] C_su2[m1,m2,m3]), then the realness phase
    ``(-1j)**(l1+l2-l3)``.  Asserted real to 1e-9.
    """
    if not abs(l1 - l2) <= l3 <= l1 + l2:
        return np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
    M1 = _real_from_complex(l1)
    M2 = _real_from_complex(l2)
    M3 = _real_from_complex(l3)
    C = su2_clebsch_gordan(l1, l2, l3).astype(np.complex128)
    C = np.einsum("am,bn,co,mno->abc", np.conj(M1), np.conj(M2), M3, C)
    C = (-1j) ** (l1 + l2 - l3) * C
    assert np.abs(C.imag).max() < 1e-9, (l1, l2, l3, np.abs(C.imag).max())
    C = C.real.copy()
    C[np.abs(C) < 1e-14] = 0.0
    return C / np.linalg.norm(C)


@functools.lru_cache(maxsize=None)
def path_sign(l1: int, l2: int, l3: int) -> float:
    """Scalar s with cg_tensor(l1,l2,l3) == s * sqrt(2l3+1) * wigner_3j(...).

    Because the two bases differ by a single common rotation (see module
    docstring) the tensors compare directly; CG uniqueness forces |s| = 1
    (asserted).
    """
    ours = np.asarray(cg_tensor(l1, l2, l3), dtype=np.float64)
    theirs = wigner_3j(l1, l2, l3) * np.sqrt(2 * l3 + 1)
    denom = np.linalg.norm(ours) * np.linalg.norm(theirs)
    if denom == 0:
        return 1.0
    cos = np.sum(ours * theirs) / denom
    assert abs(abs(cos) - 1.0) < 1e-8, (l1, l2, l3, cos)
    return 1.0 if cos > 0 else -1.0
