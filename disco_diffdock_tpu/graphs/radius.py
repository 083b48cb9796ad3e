"""On-device radius-graph construction over padded node sets.

TPU-native replacement for ``torch_cluster.radius_graph`` / ``radius``
(score_model.py:315,379-384): masked dense pairwise distances + top-k
compaction into fixed-capacity edge lists.  Rebuilt every diffusion step
inside the jitted sampler (ligand atoms move), with per-graph dynamic cutoffs
(the sigma-dependent ``3*sigma_tr + 20`` cross cutoff, score_model.py:202-206)
expressed as a broadcast scalar -- shapes never change.

Capacity overflow policy: keep the E *nearest* valid pairs (the reference
keeps all pairs under the cutoff; with adequate capacity the sets coincide,
and when they don't, dropping the farthest edges is the least-damaging
truncation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .containers import ListEdges


def pair_distances(
    pos_a: jnp.ndarray, pos_b: jnp.ndarray
) -> jnp.ndarray:
    """(B, Na, 3), (B, Nb, 3) -> (B, Na, Nb) Euclidean distances."""
    d = pos_a[:, :, None, :] - pos_b[:, None, :, :]
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)


def radius_mask(
    pos_a: jnp.ndarray,
    mask_a: jnp.ndarray,
    pos_b: jnp.ndarray,
    mask_b: jnp.ndarray,
    cutoff: jnp.ndarray | float,
    exclude_self: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense (B, Na, Nb) adjacency under a (possibly per-graph) cutoff."""
    dist = pair_distances(pos_a, pos_b)
    cut = jnp.asarray(cutoff)
    if cut.ndim == 1:  # per-graph dynamic cutoff
        cut = cut[:, None, None]
    m = (dist < cut) & mask_a[:, :, None] & mask_b[:, None, :]
    if exclude_self:
        n = pos_a.shape[1]
        m = m & ~jnp.eye(n, dtype=bool)[None]
    return m, dist


def compact_edges(
    mask: jnp.ndarray, dist: jnp.ndarray, capacity: int
) -> ListEdges:
    """Compact a dense (B, Na, Nb) adjacency into a (B, E) edge list.

    Keeps the nearest ``capacity`` valid pairs per graph.  src = a-index
    (receiver), dst = b-index (supplier).
    """
    B, Na, Nb = mask.shape
    flat_mask = mask.reshape(B, Na * Nb)
    if capacity >= Na * Nb:
        # capacity holds every pair: the compaction is an identity, so skip
        # the top_k sort entirely (profiled at ~5 ms/forward at bench shapes)
        pair = jnp.arange(Na * Nb, dtype=jnp.int32)
        src = jnp.broadcast_to(pair // Nb, (B, Na * Nb))
        dst = jnp.broadcast_to(pair % Nb, (B, Na * Nb))
        if capacity > Na * Nb:
            padn = capacity - Na * Nb
            src = jnp.pad(src, ((0, 0), (0, padn)))
            dst = jnp.pad(dst, ((0, 0), (0, padn)))
            flat_mask = jnp.pad(flat_mask, ((0, 0), (0, padn)))
        return ListEdges(src=src, dst=dst, mask=flat_mask,
                         overflow=jnp.zeros((B,), jnp.int32))
    flat_dist = dist.reshape(B, Na * Nb)
    # invalid pairs get +inf so they sort last; score = -dist for top_k
    score = jnp.where(flat_mask, -flat_dist, -jnp.inf)
    vals, idx = jax.lax.top_k(score, capacity)  # (B, E)
    # validity of the selected slots comes from the top_k VALUES (-inf =
    # masked pair): an elementwise test instead of a take_along_axis row
    # gather, which profiled at 2.6-3.9 ms/step at bench shapes
    sel_mask = vals > -jnp.inf
    src = idx // Nb
    dst = idx % Nb
    # dropped true edges per graph (a masked sum is free next to the top_k)
    overflow = jnp.maximum(
        jnp.sum(flat_mask, axis=1, dtype=jnp.int32) - capacity, 0
    )
    return ListEdges(src=src.astype(jnp.int32), dst=dst.astype(jnp.int32),
                     mask=sel_mask, overflow=overflow)


def radius_edges(
    pos_a, mask_a, pos_b, mask_b, cutoff, capacity, exclude_self=False
) -> ListEdges:
    """One-shot masked radius graph as a compact edge list."""
    m, d = radius_mask(pos_a, mask_a, pos_b, mask_b, cutoff, exclude_self)
    return compact_edges(m, d, capacity)


def knn_edges_host(
    pos: "np.ndarray", cutoff: float, max_neighbors: int | None
):
    """Host-side C-alpha kNN graph with the reference's exact semantics
    (process_mols.py:336-353): all neighbors under the cutoff, capped at the
    ``max_neighbors`` nearest, and if a node has none, connect it to its
    single nearest neighbor.  Returns (src, dst) index arrays.
    """
    import numpy as np

    n = len(pos)
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    src, dst = [], []
    for i in range(n):
        nb = list(np.where(d[i] < cutoff)[0])
        nb.remove(i)
        if max_neighbors is not None and len(nb) > max_neighbors:
            nb = list(np.argsort(d[i]))[1 : max_neighbors + 1]
        if len(nb) == 0:
            nb = list(np.argsort(d[i]))[1:2]
        src.extend([i] * len(nb))
        dst.extend(nb)
    return np.asarray(src, np.int32), np.asarray(dst, np.int32)
