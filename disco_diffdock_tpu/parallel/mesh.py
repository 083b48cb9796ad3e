"""Device mesh + data-parallel sharding for training and batched inference.

The reference's only parallelism is single-process ``DataParallel`` over CUDA
GPUs (utils/model_utils.py:98-99; SURVEY.md section 2.7).  The TPU-native
equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis; batches shard on
their leading axis, parameters replicate, and gradient synchronization is an
XLA ``psum`` over ICI emitted by ``shard_map``.  At this model scale
(~20M params) tensor/pipeline parallelism is unnecessary (SURVEY 2.7) --
scaling is pose- and complex-parallel.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are visible"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard a ComplexBatch (or any pytree with leading batch axes) over the
    mesh's data axis.  Scalar/dict leaves with a leading B axis shard; the
    batch size must divide the axis size."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_train_step(train_step, mesh: Mesh, axis_name: str = "data"):
    """Wrap a pmean-aware train step (built with axis_name=...) in shard_map.

    state replicates, batch shards on its leading axis.  The step itself
    decorrelates randomness across shards: noise draws are keyed by GLOBAL
    graph id (so sharded == unsharded exactly) and dropout keys fold in the
    shard index (train/steps.py).
    """
    from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        train_step,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    # NOT donated: the scoped EMA shadow intentionally aliases the live
    # encoder params (train/ema.py scope semantics), and XLA rejects
    # donating the same buffer twice; HBM headroom at ~20M params makes
    # double-buffering free anyway
    return jax.jit(sharded)


def shard_step(step, mesh: Mesh, n_sharded_args: int, axis_name: str = "data"):
    """shard_map wrap for a pmean-aware step of signature
    ``(state, *batch_axis_args, key) -> (state, aux)`` -- the confidence/AR
    trainer steps carry labels/latents alongside the batch, all sharded on
    their leading axis; state and rng replicate."""
    from jax.experimental.shard_map import shard_map

    in_specs = (P(),) + (P(axis_name),) * n_sharded_args + (P(),)
    sharded = shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)
