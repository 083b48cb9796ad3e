"""Wrapped-Gaussian (torus) diffusion tables + device-side lookup.

Reference behavior (/root/reference/utils/torus.py): a 5000x5000 log-log
(sigma, x) grid of the wrapped-Gaussian density and score, cached on first
use, with nearest-grid-index lookups.  TPU-native changes:

  * the truncated sum uses |i| <= 20 image terms instead of 100 -- for
    sigma <= 2*pi every dropped term underflows float64 to exactly 0
  * ``score_norm`` (E[score^2] under the wrapped Gaussian) is computed as a
    deterministic quadrature over the same x-grid instead of the reference's
    10000-sample Monte-Carlo estimate (torus.py:72-76) -- same quantity,
    no run-to-run jitter
  * lookups are vectorized jnp gathers on device arrays (the reference calls
    ``torus.score_norm(... .cpu().numpy())`` inside every forward,
    score_model.py:306).

Grid parity: X_MIN=1e-5, X_N=5000, SIGMA_MIN=3e-3, SIGMA_MAX=2, SIGMA_N=5000
(all relative to pi), and the same wrap / sign / nearest-index semantics.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

X_MIN, X_N = 1e-5, 5000
SIGMA_MIN, SIGMA_MAX, SIGMA_N = 3e-3, 2.0, 5000
_N_IMAGES = 20


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
        f"torus_tables_{X_N}x{SIGMA_N}_{X_MIN}_{SIGMA_MIN}_{SIGMA_MAX}"
        f"_{_N_IMAGES}.npz",
    )
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    x = 10 ** np.linspace(np.log10(X_MIN), 0, X_N + 1) * np.pi  # (X_N+1,)
    sigma = 10 ** np.linspace(np.log10(SIGMA_MIN), np.log10(SIGMA_MAX), SIGMA_N + 1) * np.pi

    s2 = sigma[:, None] ** 2
    # Two passes with max-term factoring so score = grad/p never hits 0/0
    # (the reference's direct sum produces NaN in the (tiny sigma, x ~ pi)
    # corner, torus.py:39).
    m = np.full((SIGMA_N + 1, X_N + 1), np.inf)
    for i in range(-_N_IMAGES, _N_IMAGES + 1):
        xi = x[None, :] + 2 * np.pi * i
        m = np.minimum(m, xi**2 / 2 / s2)
    p_rel = np.zeros((SIGMA_N + 1, X_N + 1))
    grad_rel = np.zeros((SIGMA_N + 1, X_N + 1))
    for i in range(-_N_IMAGES, _N_IMAGES + 1):
        xi = x[None, :] + 2 * np.pi * i
        e = np.exp(-(xi**2) / 2 / s2 + m)
        p_rel += e
        grad_rel += xi / s2 * e
    score = grad_rel / p_rel  # p_rel >= 1 by construction
    p = p_rel * np.exp(-m)  # unnormalized density (may underflow harmlessly)

    # E[score^2] under the wrapped Gaussian, by quadrature on the same grid.
    # The density and score^2 are both even in x, so integrate (0, pi] and the
    # normalizer over the same half-interval; the (0, x_min*pi] gap contributes
    # O(x_min) and is negligible.
    w = np.trapezoid  # numpy >= 2
    num = w(p * score**2, x, axis=1)
    den = w(p, x, axis=1)
    score_norm = num / den

    out = {
        "score": score.astype(np.float32),
        "p": p.astype(np.float32),
        "score_norm": score_norm.astype(np.float32),
    }
    # atomic write: a concurrent or interrupted run must never leave a
    # truncated table file that later imports load
    tmp = f"{path}.tmp{os.getpid()}.npz"
    np.savez(tmp, **out)
    os.replace(tmp, path)
    return out


_tables = _precompute()
SCORE_TABLE = jnp.asarray(_tables["score"])
P_TABLE = jnp.asarray(_tables["p"])
SCORE_NORM_TABLE = jnp.asarray(_tables["score_norm"])


def _x_idx(x_abs: jnp.ndarray) -> jnp.ndarray:
    lx = jnp.log(x_abs / np.pi + 1e-38)
    idx = (lx - np.log(X_MIN)) / (0 - np.log(X_MIN)) * X_N
    return jnp.clip(jnp.round(idx).astype(jnp.int32), 0, X_N)


def _sigma_idx(sigma: jnp.ndarray) -> jnp.ndarray:
    ls = jnp.log(sigma / np.pi)
    idx = (ls - np.log(SIGMA_MIN)) / (np.log(SIGMA_MAX) - np.log(SIGMA_MIN)) * SIGMA_N
    return jnp.clip(jnp.round(idx).astype(jnp.int32), 0, SIGMA_N)


def score(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Wrapped-Gaussian score d/dx log p(x; sigma), any (broadcast) shape."""
    xw = jnp.mod(x + np.pi, 2 * np.pi) - np.pi
    sign = jnp.sign(xw)
    return -sign * SCORE_TABLE[_sigma_idx(sigma), _x_idx(jnp.abs(xw))]


def p(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized wrapped-Gaussian density, any (broadcast) shape."""
    xw = jnp.mod(x + np.pi, 2 * np.pi) - np.pi
    return P_TABLE[_sigma_idx(sigma), _x_idx(jnp.abs(xw))]


def score_norm(sigma: jnp.ndarray) -> jnp.ndarray:
    """E[score^2] at level sigma (any shape)."""
    return SCORE_NORM_TABLE[_sigma_idx(sigma)]


def sample(key: jax.Array, sigma: jnp.ndarray) -> jnp.ndarray:
    """Sample from the wrapped Gaussian (sigma of any shape)."""
    out = sigma * jax.random.normal(key, sigma.shape)
    return jnp.mod(out + np.pi, 2 * np.pi) - np.pi
