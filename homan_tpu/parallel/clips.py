"""Data-parallel fitting of independent clips over a device mesh.

The reference's only cross-sample parallelism is launching separate jobs over
disjoint sample indices (--data_step/--data_offset, fit_vid_dataset.py:54-55,
190). On TPU the same independence maps onto hardware directly: a batch of
clips is stacked on a leading axis, the per-clip fit is vmapped, and the
stacked inputs are sharded over a `jax.sharding.Mesh` axis — XLA's SPMD
partitioner runs each clip's optimization on its own chip with zero
communication in the hot loop. Only metric aggregation (host-side or a final
`lax.pmean`-style reduce) crosses chips, mirroring the reference's results.pkl
accumulation.

Multi-host (DCN) deployment composes the same way: `jax.distributed` init +
a process-spanning mesh; each host feeds its slice of the clip batch.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from homan_tpu.fit import joint as joint_lib
from homan_tpu.fit import losses as L
from homan_tpu.fit import model as M
from homan_tpu.render import RasterSettings


def make_clip_mesh(n_devices: int | None = None, axis: str = "clips") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_clip_batch(tree, mesh: Mesh, axis: str = "clips"):
    """Place a stacked-clip pytree with its leading axis split over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("cfg", "lw_items", "iters", "lr",
                                    "settings"))
def _fit_clips_jit(states, consts, cfg, lw_items, iters, lr, settings):
    lw = dict(lw_items)
    optimizer = joint_lib.make_optimizer(cfg, lr)

    def fit_one(state, consts_one):
        opt_state = optimizer.init(state)

        def total_loss(s):
            loss_dict, metric_dict = L.compute_all_losses(
                s, consts_one, cfg, lw, roi_settings=settings)
            return L.weighted_sum(loss_dict, lw), (loss_dict, metric_dict)

        def step(carry, _):
            s, o = carry
            (loss, (loss_dict, metric_dict)), grads = jax.value_and_grad(
                total_loss, has_aux=True)(s)
            updates, o = optimizer.update(grads, o, s)
            s = optax.apply_updates(s, updates)
            return (s, o), {"loss": loss, **metric_dict}

        (final, _), history = jax.lax.scan(step, (state, opt_state), None,
                                           length=iters)
        return final, history

    return jax.vmap(fit_one)(states, consts)


def fit_clips_batched(
    states: M.HomanState,          # leading axis = clips
    consts: M.HomanConsts,         # leading axis = clips (replicate as needed)
    cfg: M.HomanConfig,
    loss_weights: Dict[str, float] | None = None,
    num_iterations: int = 400,
    lr: float = 1e-2,
    roi_settings: RasterSettings | None = None,
    mesh: Mesh | None = None,
    axis: str = "clips",
) -> Tuple[M.HomanState, Dict[str, jnp.ndarray]]:
    """Fit a batch of independent clips, sharded over the mesh.

    Every leaf of `states`/`consts` carries a leading clip axis; the per-clip
    joint fit of homan_tpu.fit.joint is vmapped over it and the batch is
    sharded so each device optimizes its own clips. The compiled program is
    cached on the static configuration (repeat calls don't recompile).

    Returns (final_states, history) with leading clip axes.
    """
    lw = dict(L.DEFAULT_LW)
    if loss_weights:
        lw.update(loss_weights)
    if mesh is not None:
        states = shard_clip_batch(states, mesh, axis)
        consts = shard_clip_batch(consts, mesh, axis)
    return _fit_clips_jit(states, consts, cfg, tuple(sorted(lw.items())),
                          num_iterations, lr, roi_settings)


def stack_clips(items):
    """Stack a list of same-structure pytrees along a new leading clip axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)
