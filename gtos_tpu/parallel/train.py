"""Sharded training step: DP over the mesh's 'data' axis.

Replaces the reference's whole distributed stack (SURVEY.md §3.3 —
multiprocessing spawn + NCCL init + hand-written average_gradients): the
batch is sharded over 'data', parameters and optimizer state are
replicated, and jit/GSPMD inserts the gradient all-reduce. One code path
serves 1 chip and N hosts.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import optax
from jax.sharding import Mesh

from gtos_tpu.models.generator import Generator
from gtos_tpu.parallel.mesh import arrays_shardings, replicate
from gtos_tpu.train.trainer import TrainState


def make_sharded_train_step(model: Generator, tx, mesh: Mesh,
                            example_arrays: Dict) -> Callable:
    """Returns train_step(state, arrays) with DP shardings baked in.

    `example_arrays` fixes the input layout (shardings are per-name, not
    per-shape, so any bucket signature works)."""
    rep = replicate(mesh)
    arr_sh = arrays_shardings(mesh, example_arrays)

    @functools.partial(
        jax.jit,
        in_shardings=(rep, arr_sh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    def train_step(state: TrainState, arrays):
        rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params):
            loss, metrics = model.apply(
                params, arrays, deterministic=False,
                rngs={"dropout": step_rng})
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, rng=rng), metrics

    return train_step
