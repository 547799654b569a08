"""Sharded diffusion training step (DP + TP over a Mesh).

The working equivalent of the reference's train harness semantics
(lib/utils.py:62-318 train_stage: p_losses forward, backward, optimizer step,
grad accumulation) — rebuilt as one jitted SPMD program: batch sharded over
'data', UNet attention/FF params sharded over 'model' (see sharding.py),
gradient reduction and TP collectives inserted by XLA over ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax

from pfd_tpu.parallel import mesh as mesh_lib
from pfd_tpu.parallel import sharding


@partial(jax.tree_util.register_dataclass, data_fields=["params", "opt_state", "step"],
         meta_fields=[])
@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: object
    step: jnp.ndarray


def make_optimizer(lr=1e-4, weight_decay=0.01, grad_clip=1.0,
                   b1=0.9, b2=0.999):
    """adamw factory (reference get_optimizer.py:14-47 builds sgd/adam/adamw;
    adamw is the live choice for diffusion training)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay),
    )


def make_train_step(model, optimizer, mesh, *, x_type="image", c_type="image",
                    train_mask=None, donate=True):
    """Returns (init_state, step_fn).

    step_fn(state, batch, rng) -> (state, metrics); batch:
      {'x0': (B,h,w,4) latents, 'cond': (B,S,768) context tokens,
       't': (B,) int32, 'noise': like x0}.
    ``train_mask``: optional pytree of bools selecting trainable params
    (mirrors the reference parameter_group selectivity, pfd.py:94-98).
    """
    data_shard = mesh_lib.data_sharding(mesh)
    repl = mesh_lib.replicated(mesh)
    if train_mask is not None:
        # the optimizer must never see frozen params: adamw's decoupled weight
        # decay would decay them toward zero even with zeroed grads (the
        # reference instead excludes them from the optimizer entirely)
        optimizer = optax.masked(optimizer, train_mask)

    def loss_fn(params, batch):
        loss, metrics = model.p_losses(
            params, batch["x0"], batch["t"], batch["cond"], batch["noise"],
            x_type=x_type, c_type=c_type)
        return loss, metrics

    def step_fn(state, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        if train_mask is not None:
            # zero frozen grads so grad_norm reflects trainable params only
            # (updates to them are already blocked by optax.masked above)
            grads = jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g),
                                 grads, train_mask)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss,
                       grad_norm=optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1), metrics

    def init_state(params):
        params = sharding.place_params(params, mesh)
        opt_state = jax.jit(
            optimizer.init,
            out_shardings=None)(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    batch_shard = mesh_lib.batch_only_sharding(mesh)
    jitted = jax.jit(
        step_fn,
        in_shardings=(None, {
            "x0": data_shard, "cond": batch_shard,
            "t": batch_shard, "noise": data_shard}, repl),
        out_shardings=None,
        donate_argnums=(0,) if donate else (),
    )
    return init_state, jitted
