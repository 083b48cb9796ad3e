"""Reverse-diffusion sampling engine: one jit-compiled ``lax.scan``.

The reference sampler (utils/sampling.py:49-249) runs a host Python loop of 20
steps per pose batch, with per-step host<->device syncs (score-norm table
lookups on CPU, numpy scalars, dynamic radius graphs).  Here the entire loop
-- per-step graph rebuild, score-model forward, optional classifier-free
guidance, Euler-Maruyama drift+noise with DisCo-Diff low-temperature scaling
(:171-192), and the manifold conformer update -- is a single ``lax.scan``
compiled once; zero host round-trips.

Behavior parity notes:
  * noise is zeroed when ``no_random`` or on the final step with
    ``no_final_step_noise`` (:146-147), as a per-step mask in the scan xs
  * temperature scaling uses the same 9 constants (psi / sampling temp /
    sigma_data per component), with sigma_data interpolated in log-space
  * in ODE mode the drift halves and noise drops (:142-144)
  * the CFG window [cfg_end, cfg_start] is static (the t grid is known at
    trace time), so the scan splits into segments and the unconditional
    forward is only *compiled into* the in-window segments -- exactly the
    reference's skip (utils/sampling.py:119-135), without dynamic shapes.

Segmented scan: the sigma-dependent cross cutoff ``3*sigma+20`` shrinks
monotonically along the trajectory, so early steps need a much larger cross
-edge capacity than late ones.  ``reverse_diffusion`` accepts a list of
``(n_steps, score_fn)`` segments -- each segment scans with its own compiled
step (its own edge capacities) and the carry flows through.  This keeps every
step exact (zero dropped edges, see graphs/audit.py) at a fraction of the
worst-case-everywhere cost.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.conformer import modify_conformer, masked_mean
from ..geom.diffusion import SigmaSchedule, get_t_schedule
from ..geom.rotations import random_rotation_matrix
from ..geom.torsion import apply_torsion_updates
from ..graphs.containers import ComplexBatch


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    inference_steps: int = 20
    # run only the first N steps of the inference_steps schedule (the
    # reference's --actual_steps, evaluate.py:269); the final executed step
    # integrates the full remaining time to t=0 as in the reference
    actual_steps: "int | None" = None
    ode: bool = False
    no_random: bool = False
    # reference default False (sampling() kwarg, utils/sampling.py:51) — the
    # confidence pose cache and train-time validation inference run with
    # final-step noise ON; the shipped inference recipes pass the flag
    no_final_step_noise: bool = False
    no_torsion: bool = False
    # DisCo-Diff low-temperature sampling constants (README.md:15,20)
    temp_sampling: tuple = (1.0, 1.0, 1.0)  # (tr, rot, tor)
    temp_psi: tuple = (0.0, 0.0, 0.0)
    temp_sigma_data: tuple = (0.5, 0.5, 0.5)
    # classifier-free guidance
    cfg_weight: float = 0.0
    cfg_start: float = 1.0
    cfg_end: float = 0.0
    return_trajectory: bool = False


def decode_latent_anchors(batch: ComplexBatch, latent) -> list[dict] | None:
    """Decode equivariant latents into anchor strings + positions per graph
    (parity with utils/sampling.py:205-221: 'L<idx>'/'R<idx>' per slot, with
    positions shifted back by the original center).

    Only the equivariant node-anchor latents — a ``(lig, rec)`` pair of
    per-node one-hots — decode to anchors.  vocab>1 / virtual-node latents
    are a single invariant array with no node identity to print; returns
    ``None`` for those (and anything else that is not a 2-tuple)."""
    if not (isinstance(latent, (tuple, list)) and len(latent) == 2):
        return None
    lat_l, lat_r = latent
    lat_l = np.asarray(lat_l)
    lat_r = np.asarray(lat_r)
    pos_l = np.asarray(batch.lig_pos)
    pos_r = np.asarray(batch.rec_pos)
    center = np.asarray(batch.original_center)
    out = []
    for b in range(batch.num_graphs):
        s, pos = "", []
        for j in range(lat_l.shape[-1]):
            if lat_l[b, :, j].sum() >= 0.5:
                idx = int(lat_l[b, :, j].argmax())
                s += f"L{idx}"
                pos.append(pos_l[b, idx] + center[b])
            else:
                idx = int(lat_r[b, :, j].argmax())
                s += f"R{idx}"
                pos.append(pos_r[b, idx] + center[b])
        out.append({"latent_str": s, "latent_pos": np.asarray(pos)})
    return out


def randomize_position(
    key: jax.Array,
    batch: ComplexBatch,
    no_torsion: bool,
    no_random: bool,
    tr_sigma_max: float,
) -> ComplexBatch:
    """Initialize poses (parity with utils/sampling.py:12-46): uniform random
    torsions, a uniform random rigid rotation about the ligand centroid, and a
    Gaussian translation of std ``tr_sigma_max`` (unless ``no_random``)."""
    B, NL = batch.lig_pos.shape[:2]
    k_tor, k_rot, k_tr = jax.random.split(key, 3)
    pos = batch.lig_pos

    if not no_torsion:
        R = batch.tor_edges.shape[1]
        upd = jax.random.uniform(k_tor, (B, R), minval=-np.pi, maxval=np.pi)
        pos = apply_torsion_updates(
            pos, batch.tor_edges, batch.tor_mask_rotate, upd, batch.tor_mask
        )

    center = masked_mean(pos, batch.lig_mask)
    rot = random_rotation_matrix(k_rot, (B,))
    pos = jnp.einsum("bni,bji->bnj", pos - center, rot)
    if not no_random:
        pos = pos + jax.random.normal(k_tr, (B, 1, 3)) * tr_sigma_max
    return batch.replace(lig_pos=pos)


def rotate_ligand(batch: ComplexBatch, key: jax.Array) -> ComplexBatch:
    """Random rigid rotation about the ligand centroid — the unconditional
    center+rotate part of the reference's randomize_position
    (utils/sampling.py:25-29), also used for ar_pos under no_randomness
    (:36-43)."""
    pos = batch.lig_pos
    center = masked_mean(pos, batch.lig_mask)
    R = random_rotation_matrix(key, (pos.shape[0],))
    return batch.replace(lig_pos=jnp.einsum("bni,bji->bnj", pos - center, R))


def ar_conditioning_pose(batch: ComplexBatch, key: jax.Array,
                         no_randomness: bool) -> ComplexBatch:
    """The pose the AR prior conditions on (the reference's ``ar_pos``,
    utils/sampling.py:36-46,83-88): a rotated RAW RDKit conformer when the
    AR model was trained with no_randomness (the shipped recipe), else the
    randomized initial pose itself (pass the post-randomize_position batch).
    """
    if not no_randomness:
        return batch
    return rotate_ligand(
        batch.replace(lig_pos=batch.extras.get("rdkit_pos", batch.lig_pos)),
        key,
    )


def schedule_with_dt(t_schedule, actual_steps: int | None = None):
    """``(t, dt)`` for the reverse trajectory.  The final dt integrates all
    the way to t=0; with ``actual_steps`` truncation the LAST EXECUTED step
    keeps the reference's full-remaining-time dt (``dt = schedule[t_idx]`` on
    the final loop iteration, utils/sampling.py:107-110 with the loop running
    actual_steps iterations), not just the grid increment -- either way
    ``dt.sum() == t[0]``."""
    t = np.asarray(t_schedule, np.float32)
    dt = np.concatenate([t[:-1] - t[1:], [t[-1]]]).astype(np.float32)
    if actual_steps and actual_steps < len(t):
        t, dt = t[:actual_steps], dt[:actual_steps].copy()
        dt[-1] = t[-1]
    return t, dt


def reverse_diffusion(
    score_fn: Callable,
    batch: ComplexBatch,
    key: jax.Array,
    cfg: SamplerConfig,
    sigma: SigmaSchedule,
    t_schedule: Optional[np.ndarray] = None,
    noise_override=None,
):
    """Run the reverse SDE as (a chain of) ``lax.scan``s.

    ``score_fn(batch_with_time, unconditional) -> (tr, rot, tor)`` must be a
    pure traced function (typically a closure over model.apply + params +
    latents) -- or a list of ``(n_steps, score_fn)`` segments whose step
    counts sum to ``cfg.inference_steps`` (each segment may close over a
    model with different edge capacities).  Returns the final ComplexBatch
    (and the position trajectory (steps, B, NL, 3) if
    ``cfg.return_trajectory``).

    ``noise_override``: optional pre-drawn noise ``(tr_z (S,B,3),
    rot_z (S,B,3), tor_z (S,B,R))`` for S EXECUTED steps, consumed in place
    of the PRNG draws -- this decouples RNG-stream differences from math
    differences so torch-oracle trajectory parity tests can share one noise
    sequence with the reference twin (utils/sampling.py:148-168's torch
    randn draws).  The per-step noise mask (no_random / no_final_step_noise)
    still applies.
    """
    steps = cfg.inference_steps
    if t_schedule is None:
        t_schedule = get_t_schedule(steps)
    t, dt = schedule_with_dt(t_schedule, cfg.actual_steps)
    steps = len(t)
    noise_on = np.ones(steps, np.float32)
    if cfg.no_random:
        noise_on[:] = 0.0
    if cfg.no_final_step_noise:
        noise_on[-1] = 0.0

    if cfg.ode and any(ts != 1.0 for ts in cfg.temp_sampling):
        # the low-temperature branch is an SDE update with noise and would
        # silently override the deterministic ODE contract; the reference
        # cannot combine them either (its ode branch leaves tr_z undefined,
        # utils/sampling.py:142-185 -> NameError) — error clearly instead
        raise ValueError(
            "ode=True cannot combine with low-temperature sampling "
            "(temp_sampling != 1): the temperature-scaled update is an SDE "
            "step with noise"
        )

    if callable(score_fn):
        fn_segments = [(steps, score_fn)]
    else:
        fn_segments = list(score_fn)
        total = sum(n for n, _ in fn_segments)
        assert total == cfg.inference_steps, (
            f"segment steps {[n for n, _ in fn_segments]} != {cfg.inference_steps}"
        )
        if steps < total:  # --actual_steps truncation (evaluate.py:61)
            trunc, left = [], steps
            for n, f in fn_segments:
                if left <= 0:
                    break
                trunc.append((min(n, left), f))
                left -= min(n, left)
            fn_segments = trunc

    # static CFG window: per-step bool on the (trace-time) t grid, matching
    # the reference's `cfg_end <= t <= cfg_start` check (sampling.py:119-135)
    cfg_on_steps = (
        (cfg.cfg_weight != 0.0) & (t <= cfg.cfg_start) & (t >= cfg.cfg_end)
    )

    tr_g_const = math.sqrt(2 * math.log(sigma.tr_sigma_max / sigma.tr_sigma_min))
    rot_g_const = math.sqrt(2 * math.log(sigma.rot_sigma_max / sigma.rot_sigma_min))
    tor_g_const = math.sqrt(2 * math.log(sigma.tor_sigma_max / sigma.tor_sigma_min))

    def _sigma_data(temp_sigma_data, smin, smax):
        return math.exp(
            temp_sigma_data * math.log(smax) + (1 - temp_sigma_data) * math.log(smin)
        )

    B = batch.num_graphs
    R = batch.tor_edges.shape[1]

    if noise_override is not None:
        no_tr, no_rot, no_tor = (jnp.asarray(x, jnp.float32)
                                 for x in noise_override)
        assert no_tr.shape[0] == steps, (
            f"noise_override covers {no_tr.shape[0]} steps, "
            f"{steps} will execute")

    def make_step(seg_fn, use_cfg):
        def step(carry, xs):
            pos, k = carry
            if noise_override is not None:
                t_cur, dt_cur, nz, tr_n, rot_n, tor_n = xs
            else:
                t_cur, dt_cur, nz = xs
                k, k_tr, k_rot, k_tor = jax.random.split(k, 4)
                tr_n = jax.random.normal(k_tr, (B, 3))
                rot_n = jax.random.normal(k_rot, (B, 3))
                tor_n = jax.random.normal(k_tor, (B, R))

            b = batch.replace(lig_pos=pos).set_time(t_cur, t_cur, t_cur)
            tr_sigma, rot_sigma, tor_sigma = sigma.t_to_sigma(t_cur, t_cur, t_cur)

            tr_score, rot_score, tor_score = seg_fn(b, unconditional=None)

            if use_cfg:
                # unconditional forward only compiled into in-window segments
                u_tr, u_rot, u_tor = seg_fn(b, unconditional=jnp.ones((B, 1)))
                w = cfg.cfg_weight
                tr_score = tr_score + w * (tr_score - u_tr)
                rot_score = rot_score + w * (rot_score - u_rot)
                tor_score = tor_score + w * (tor_score - u_tor)

            tr_g = tr_sigma * tr_g_const
            rot_g = rot_sigma * rot_g_const
            tor_g = tor_sigma * tor_g_const

            tr_z = nz * tr_n
            rot_z = nz * rot_n
            tor_z = nz * tor_n

            if cfg.ode:
                tr_perturb = 0.5 * tr_g**2 * dt_cur * tr_score
                rot_perturb = 0.5 * rot_g**2 * dt_cur * rot_score
                tor_perturb = 0.5 * tor_g**2 * dt_cur * tor_score
            else:
                tr_perturb = tr_g**2 * dt_cur * tr_score + tr_g * jnp.sqrt(dt_cur) * tr_z
                rot_perturb = rot_g**2 * dt_cur * rot_score + rot_g * jnp.sqrt(dt_cur) * rot_z
                tor_perturb = tor_g**2 * dt_cur * tor_score + tor_g * jnp.sqrt(dt_cur) * tor_z

            # DisCo-Diff low-temperature sampling (utils/sampling.py:179-192)
            ts, psi, tsd = cfg.temp_sampling, cfg.temp_psi, cfg.temp_sigma_data
            if ts[0] != 1.0:
                sd = _sigma_data(tsd[0], sigma.tr_sigma_min, sigma.tr_sigma_max)
                lam = (sd + tr_sigma) / (sd + tr_sigma / ts[0])
                tr_perturb = tr_g**2 * dt_cur * (lam + ts[0] * psi[0] / 2) * tr_score \
                    + tr_g * jnp.sqrt(dt_cur * (1 + psi[0])) * tr_z
            if ts[1] != 1.0:
                sd = _sigma_data(tsd[1], sigma.rot_sigma_min, sigma.rot_sigma_max)
                lam = (sd + rot_sigma) / (sd + rot_sigma / ts[1])
                rot_perturb = rot_g**2 * dt_cur * (lam + ts[1] * psi[1] / 2) * rot_score \
                    + rot_g * jnp.sqrt(dt_cur * (1 + psi[1])) * rot_z
            if ts[2] != 1.0:
                sd = _sigma_data(tsd[2], sigma.tor_sigma_min, sigma.tor_sigma_max)
                lam = (sd + tor_sigma) / (sd + tor_sigma / ts[2])
                tor_perturb = tor_g**2 * dt_cur * (lam + ts[2] * psi[2] / 2) * tor_score \
                    + tor_g * jnp.sqrt(dt_cur * (1 + psi[2])) * tor_z

            new_pos = modify_conformer(
                pos,
                batch.lig_mask,
                tr_perturb,
                rot_perturb,
                None if cfg.no_torsion else tor_perturb,
                batch.tor_edges,
                batch.tor_mask_rotate,
                batch.tor_mask,
            )
            out = new_pos if cfg.return_trajectory else None
            return (new_pos, k), out

        return step

    # split into (n, fn, use_cfg) runs: segment boundaries from the fn
    # schedule, further split where the static CFG window opens/closes
    runs = []
    ofs = 0
    for n, fn in fn_segments:
        i = ofs
        while i < ofs + n:
            on = bool(cfg_on_steps[i])
            j = i
            while j < ofs + n and bool(cfg_on_steps[j]) == on:
                j += 1
            runs.append((i, j, fn, on))
            i = j
        ofs += n

    # NOTE: scan unroll=2 measured 0.89 vs 1.42 complexes/sec end-to-end
    # (doubled live ranges overwhelm HBM scheduling); keep unroll=1.
    carry = (batch.lig_pos, key)
    trajs = []
    for (i, j, fn, on) in runs:
        xs = (jnp.asarray(t[i:j]), jnp.asarray(dt[i:j]), jnp.asarray(noise_on[i:j]))
        if noise_override is not None:
            xs = xs + (no_tr[i:j], no_rot[i:j], no_tor[i:j])
        carry, traj = jax.lax.scan(make_step(fn, on), carry, xs)
        if cfg.return_trajectory:
            trajs.append(traj)
    final_pos, _ = carry
    traj = jnp.concatenate(trajs, axis=0) if cfg.return_trajectory else None
    final = batch.replace(lig_pos=final_pos)
    return (final, traj) if cfg.return_trajectory else (final, None)


def sampling(
    model,
    variables,
    batch: ComplexBatch,
    key: jax.Array,
    cfg: SamplerConfig,
    sigma: SigmaSchedule,
    latent=None,
    confidence_model=None,
    confidence_variables=None,
    confidence_batch: Optional[ComplexBatch] = None,
    t_schedule=None,
    shared_rec: bool = False,
    noise_override=None,
):
    """High-level sampling: score model + optional latents + confidence.

    Functional counterpart of utils/sampling.py:49-249.  ``latent`` is either
    None or the (lat_l, lat_r) node one-hots from the encoder / AR prior.
    ``model`` is one model, or a list of ``(n_steps, model)`` segments (same
    variables, different edge capacities -- see reverse_diffusion).
    ``shared_rec``: set when every graph in the batch is a pose copy of one
    complex (the standard N-poses protocol) -- receptor-side model work then
    runs once instead of per pose (models/score_model.py embed docstring).
    Returns (final_batch, confidence, trajectory).
    """

    def make_score_fn(mdl):
        def score_fn(b, unconditional):
            lat = latent
            if unconditional is not None and lat is not None:
                lat = jax.tree.map(lambda x: 0.0 * x, lat)
            if unconditional is None:
                unconditional = jnp.zeros((b.num_graphs, 1))
            # only pass the kwarg when set: other model views (wrapper
            # adapters, all-atom) do not take it
            kw = {"shared_rec": True} if shared_rec else {}
            return mdl.apply(
                variables, b, latent=lat, unconditional=unconditional,
                deterministic=True, use_running_average=True, **kw,
            )
        return score_fn

    if isinstance(model, (list, tuple)):
        score_fn = [(n, make_score_fn(m)) for n, m in model]
    else:
        score_fn = make_score_fn(model)

    final, traj = reverse_diffusion(score_fn, batch, key, cfg, sigma,
                                    t_schedule, noise_override=noise_override)

    confidence = None
    if confidence_model is not None:
        cb = confidence_batch if confidence_batch is not None else final
        cb = cb.replace(lig_pos=final.lig_pos).set_time(0.0, 0.0, 0.0)
        kw = {"shared_rec": True} if shared_rec else {}
        confidence = confidence_model.apply(
            confidence_variables, cb, deterministic=True,
            use_running_average=True, **kw,
        )
        if confidence.ndim == 2:
            # multi-output heads (--rmsd_classification_cutoff training:
            # num_confidence_outputs = len(cutoffs)+1) rank by the class-0
            # logit (rmsd below the lowest cutoff), evaluate.py:317-318
            confidence = confidence[:, 0]
        confidence = jnp.nan_to_num(confidence, nan=-1000.0)
    return final, confidence, traj
