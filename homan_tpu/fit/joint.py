"""Stage C — joint hand+object optimization as one compiled XLA program.

TPU-native equivalent of homan/jointopt.py:22-201: the reference's python
iteration loop (tqdm + per-step host sync) becomes a single `lax.scan` of
`num_iterations` Adam steps over the HomanState pytree, compiled once per
shape bucket. The three-LR-group Adam structure (rigid lr, mano lr*10,
rotations lr*10; homan/jointopt.py:128-151) maps to optax.multi_transform,
with the reference's implicitly-frozen parameters (mano_rot, mano_trans,
non-Parameter scales) in a zero group.

Loss histories are scan outputs, so the full loss_evolution
(homan/jointopt.py:154,184-189) arrives on host in one transfer.

The scan program is cached at module level keyed on all static configuration
(iteration count, weights, settings, cfg, lr): repeated fits with the same
shapes reuse the compiled executable.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from homan_tpu.fit import losses as L
from homan_tpu.fit import model as M
from homan_tpu.render import RasterSettings


def make_optimizer(cfg: M.HomanConfig, lr: float = 1e-2) -> optax.GradientTransformation:
    labels_template = M.optimizer_param_labels(cfg)
    return optax.multi_transform(
        {
            "rigid": optax.adam(lr),
            "mano": optax.adam(lr * 10),
            "rot": optax.adam(lr * 10),
            "frozen": optax.set_to_zero(),
        },
        labels_template,
    )


@partial(jax.jit, static_argnames=("cfg", "lw_items", "iters", "lr",
                                   "settings", "with_closed_faces"))
def _run_phase(state, opt_state, consts, closed_hand_faces,
               cfg: M.HomanConfig, lw_items, iters: int, lr: float,
               settings, with_closed_faces: bool):
    lw = dict(lw_items)
    optimizer = make_optimizer(cfg, lr)

    def total_loss(s):
        loss_dict, metric_dict = L.compute_all_losses(
            s, consts, cfg, lw,
            closed_hand_faces=closed_hand_faces if with_closed_faces else None,
            roi_settings=settings)
        return L.weighted_sum(loss_dict, lw), (loss_dict, metric_dict)

    def step(carry, _):
        s, o = carry
        (loss, (loss_dict, metric_dict)), grads = jax.value_and_grad(
            total_loss, has_aux=True)(s)
        updates, o = optimizer.update(grads, o, s)
        s = optax.apply_updates(s, updates)
        history = {"loss": loss, **loss_dict, **metric_dict}
        return (s, o), history

    (final_state, final_opt), history = jax.lax.scan(
        step, (state, opt_state), None, length=iters)
    return final_state, final_opt, history


def _phase_chunks(iters: int, viz_step: int | None, with_viz: bool):
    """Scan-chunk sizes _run_phase compiles for one phase.

    The ONE chunk-derivation rule shared by prewarm and
    optimize_hand_object — if they disagreed, prewarm would compile
    programs the real call never uses (pure wasted relay compile) while
    the real program cold-compiles at fit time.
    """
    if with_viz and viz_step and viz_step < iters:
        chunks = [viz_step] * (iters // viz_step)
        if iters % viz_step:
            chunks.append(iters % viz_step)
        return chunks
    return [iters]


def prewarm(state, consts, cfg, loss_weights=None, num_iterations: int = 400,
            lr: float = 1e-2, closed_hand_faces=None, roi_settings=None,
            viz_step: int | None = None):
    """Compile the phase programs for these shapes WITHOUT executing them.

    Invokes the same `_run_phase` programs that optimize_hand_object will
    call (including the viz_step chunk split) on the given (dummy-valued)
    inputs: the executables land in the in-process pjit cache keyed on the
    identical avals + statics, so the later real call is a pure cache hit
    (an AOT .lower().compile() would only seed the on-disk cache, which
    still pays tracing + relay time). Concurrent XLA compiles overlap
    (measured ~2x on the axon relay), so calling this from a background
    thread while stages A+B run hides most of the stage-C first-call
    latency; the dummy execution itself costs well under a second of
    device time.
    """
    lw = dict(L.DEFAULT_LW)
    if loss_weights:
        lw.update(loss_weights)
    lw_items = tuple(sorted(lw.items()))
    optimizer = make_optimizer(cfg, lr)
    opt_state = optimizer.init(state)
    if closed_hand_faces is None:
        closed = jnp.zeros((1, 3), jnp.int32)
        with_closed = False
    else:
        closed = closed_hand_faces
        with_closed = True
    # Same chunk rule as optimize_hand_object (passing viz_step to prewarm
    # asserts the real call will chunk by it, i.e. will set viz_callback).
    chunk_sizes = set(_phase_chunks(num_iterations, viz_step,
                                    with_viz=viz_step is not None))
    for chunk in sorted(chunk_sizes):
        out = _run_phase(state, opt_state, consts, closed, cfg, lw_items,
                         chunk, lr, roi_settings, with_closed)
        jax.block_until_ready(out[0])


def optimize_hand_object(
    state: M.HomanState,
    consts: M.HomanConsts,
    cfg: M.HomanConfig,
    loss_weights: Dict[str, float] | None = None,
    num_iterations: int = 400,
    lr: float = 1e-2,
    closed_hand_faces=None,
    roi_settings: RasterSettings | None = None,
    raster_schedule=None,
    opt_state=None,
    viz_step: int | None = None,
    viz_callback=None,
) -> Tuple[M.HomanState, Dict[str, jnp.ndarray]]:
    """Run the joint fit; returns (final_state, loss/metric evolution).

    loss_weights are python floats (static): zero-weight branches are pruned
    from the compiled program.

    raster_schedule: optional list of (num_iters, RasterSettings) phases for
    coarse-to-fine silhouette softness — a wide-sigma phase supplies
    long-range gradients, a sharp phase removes residual bias. Overrides
    num_iterations/roi_settings when given. Adam state carries across phases.

    viz_step/viz_callback: when both set, the scan is chunked into viz_step
    -sized programs (one compile + one remainder compile) and
    viz_callback(iters_done, state) runs between chunks — the periodic
    visualization hook of the reference's host loop (jointopt.py:158-177)
    without per-step host sync.
    """
    lw = dict(L.DEFAULT_LW)
    if loss_weights:
        lw.update(loss_weights)
    lw_items = tuple(sorted(lw.items()))

    optimizer = make_optimizer(cfg, lr)
    if opt_state is None:
        opt_state = optimizer.init(state)

    if raster_schedule is None:
        raster_schedule = [(num_iterations, roi_settings)]

    if closed_hand_faces is None:
        # Static placeholder so the jit signature stays uniform.
        closed = jnp.zeros((1, 3), jnp.int32)
        with_closed = False
    else:
        closed = closed_hand_faces
        with_closed = True

    histories = []
    done = 0
    for iters, settings in raster_schedule:
        chunks = _phase_chunks(iters, viz_step,
                               with_viz=viz_callback is not None)
        for chunk in chunks:
            state, opt_state, history = _run_phase(
                state, opt_state, consts, closed, cfg, lw_items, chunk, lr,
                settings, with_closed)
            histories.append(history)
            done += chunk
            if viz_callback is not None and viz_step and done < sum(
                    it for it, _ in raster_schedule):
                viz_callback(done, state)
    if len(histories) == 1:
        return state, histories[0]
    merged = {
        k: jnp.concatenate([h[k] for h in histories])
        for k in histories[0]
        if all(k in h for h in histories)
    }
    return state, merged
