"""IGSO(3) diffusion tables: truncated-series precompute + device-side lookup.

Reference behavior (/root/reference/utils/so3.py): a 1000-point log-sigma grid
x 2000-point omega grid of the isotropic Gaussian-on-SO(3) marginal density,
cdf (for inverse-cdf sampling), score norms, and expected score norms, cached
to disk on first use.  Two TPU-native changes:

  * the series sums are computed as (eps x L) @ (L x omega) matrix products
    instead of Python loops over L=2000 terms (seconds instead of minutes)
  * lookups are vectorized jnp ops on device-resident arrays -- no
    ``.cpu()`` round-trips inside the sampler (the reference calls
    ``so3.score_norm(rot_sigma.cpu())`` inside every forward,
    score_model.py:286).

Grid parity: MIN_EPS=0.01, MAX_EPS=2, N_EPS=1000, X_N=2000, L=2000, and the
same nearest-eps-row + linear-in-omega interpolation semantics.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

MIN_EPS, MAX_EPS, N_EPS = 0.01, 2.0, 1000
X_N = 2000
_L = 2000


def _cache_dir() -> str:
    d = os.environ.get(
        "DISCO_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _precompute() -> dict[str, np.ndarray]:
    # grid constants in the filename: changing them must not reuse a stale
    # cache
    path = os.path.join(
        _cache_dir(),
        f"so3_tables_{N_EPS}x{X_N}_L{_L}_{MIN_EPS}_{MAX_EPS}.npz",
    )
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    eps = 10 ** np.linspace(np.log10(MIN_EPS), np.log10(MAX_EPS), N_EPS)
    omega = np.linspace(0, np.pi, X_N + 1)[1:]
    ls = np.arange(_L, dtype=np.float64)

    # A[e, l] = (2l+1) exp(-l(l+1) eps^2)  -- per-sigma series weights
    A = (2 * ls + 1) * np.exp(-np.outer(eps**2, ls * (ls + 1)))
    # B[l, w] = sin(w(l+1/2)) / sin(w/2)   -- Dirichlet-kernel terms
    half = np.sin(omega / 2.0)
    arg = np.outer(ls + 0.5, omega)
    Bm = np.sin(arg) / half[None, :]
    expansion = A @ Bm  # (N_EPS, X_N)

    # d/dw log of each term: (lo*dhi - hi*dlo)/lo^2
    hi = np.sin(arg)
    dhi = (ls + 0.5)[:, None] * np.cos(arg)
    dlo = 0.5 * np.cos(omega / 2.0)
    Cm = (half[None, :] * dhi - hi * dlo) / half[None, :] ** 2
    score_norms = (A @ Cm) / expansion  # (N_EPS, X_N)

    pdf = expansion * (1 - np.cos(omega)) / np.pi
    cdf = np.cumsum(pdf, axis=1) / X_N * np.pi
    exp_score_norms = np.sqrt(
        np.sum(score_norms**2 * pdf, axis=1) / np.sum(pdf, axis=1) / np.pi
    )

    out = {
        "omega": omega.astype(np.float32),
        "cdf": cdf.astype(np.float32),
        "score_norms": score_norms.astype(np.float32),
        "exp_score_norms": exp_score_norms.astype(np.float32),
    }
    # atomic write: a concurrent or interrupted run must never leave a
    # truncated table file that later imports load
    tmp = f"{path}.tmp{os.getpid()}.npz"
    np.savez(tmp, **out)
    os.replace(tmp, path)
    return out


_tables = _precompute()
OMEGA = jnp.asarray(_tables["omega"])
CDF = jnp.asarray(_tables["cdf"])
SCORE_NORMS = jnp.asarray(_tables["score_norms"])
EXP_SCORE_NORMS = jnp.asarray(_tables["exp_score_norms"])


def _eps_idx(eps: jnp.ndarray) -> jnp.ndarray:
    """Nearest row on the log-sigma grid (parity with so3.py:70-71)."""
    idx = (
        (jnp.log10(eps) - np.log10(MIN_EPS))
        / (np.log10(MAX_EPS) - np.log10(MIN_EPS))
        * N_EPS
    )
    return jnp.clip(jnp.round(idx).astype(jnp.int32), 0, N_EPS - 1)


def score_norm(eps: jnp.ndarray) -> jnp.ndarray:
    """Expected IGSO(3) score norm at noise level eps (any shape)."""
    return EXP_SCORE_NORMS[_eps_idx(eps)]


def score_vec(eps: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """IGSO(3) score of rotation vector(s) ``vec`` (..., 3) at level eps (...)."""
    row = SCORE_NORMS[_eps_idx(eps)]  # (..., X_N)
    om = jnp.linalg.norm(vec, axis=-1)
    # linear interpolation of om into the (shared, uniform) omega grid
    f = jnp.clip((om - OMEGA[0]) / (OMEGA[-1] - OMEGA[0]) * (X_N - 1), 0, X_N - 1)
    i0 = jnp.floor(f).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, X_N - 1)
    w = f - i0
    val = jnp.take_along_axis(row, i0[..., None], axis=-1)[..., 0] * (1 - w) + (
        jnp.take_along_axis(row, i1[..., None], axis=-1)[..., 0] * w
    )
    return val[..., None] * vec / (om[..., None] + 1e-12)


def sample(key: jax.Array, eps: jnp.ndarray) -> jnp.ndarray:
    """Sample rotation angles omega ~ IGSO(3) marginal via inverse cdf.

    eps: any shape; returns the same shape.
    """
    rows = CDF[_eps_idx(eps)]  # (..., X_N)
    u = jax.random.uniform(key, eps.shape)
    # inverse-cdf by linear interpolation (vectorized jnp.interp per row)
    idx = jnp.sum(rows < u[..., None], axis=-1)
    i1 = jnp.clip(idx, 1, X_N - 1)
    i0 = i1 - 1
    c0 = jnp.take_along_axis(rows, i0[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(rows, i1[..., None], axis=-1)[..., 0]
    w = jnp.clip((u - c0) / (c1 - c0 + 1e-12), 0.0, 1.0)
    om0 = OMEGA[i0]
    om1 = OMEGA[i1]
    return om0 * (1 - w) + om1 * w


def sample_vec(key: jax.Array, eps: jnp.ndarray) -> jnp.ndarray:
    """Sample rotation vectors (..., 3) ~ IGSO(3) at level eps (...)."""
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, eps.shape + (3,))
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    return x * sample(k2, eps)[..., None]
