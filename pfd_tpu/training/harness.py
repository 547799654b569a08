"""Training harness — the working equivalent of the reference exec containers.

Reference semantics (lib/utils.py:62-318 train_stage + 420-617 train/eval
containers, all vestigial there — its data_factory/evaluator modules don't
exist): epoch/iter loop with gradient accumulation (`gradacc_every`), periodic
eval (`eval_every`), periodic checkpoint (`ckpt_every`), LR scheduling by
step, EMA shadow update, resume from saved state, metric logging.

TPU-first: one jitted SPMD step over a Mesh (DP+TP per parallel/sharding.py);
grad accumulation is a lax.scan over microbatches inside the step; the shm
barrier/broadcast side-channel (lib/sync.py) is unnecessary under
single-controller JAX.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import optax

from pfd_tpu.io import checkpoint as ckpt_lib
from pfd_tpu.parallel import mesh as mesh_lib
from pfd_tpu.parallel import sharding
from pfd_tpu.training import ema as ema_lib
from pfd_tpu.utils.logging import MetricLogger, print_log


@dataclasses.dataclass
class TrainConfig:
    max_steps: int = 10000
    grad_acc: int = 1          # gradacc_every (utils.py:74,129)
    log_every: int = 50
    eval_every: int = 1000
    ckpt_every: int = 1000
    use_ema: bool = False
    ema_decay: float = 0.9999
    ckpt_dir: str | None = None
    log_dir: str | None = None


class Trainer:
    def __init__(self, model, optimizer, mesh, cfg: TrainConfig,
                 lr_schedule: Callable[[int], float] | None = None,
                 x_type="image", c_type="image", train_mask=None):
        self.model = model
        if train_mask is not None:
            # keep frozen params out of the optimizer: adamw's decoupled
            # weight decay would otherwise decay them even with zeroed grads
            optimizer = optax.masked(optimizer, train_mask)
        self.optimizer = optimizer
        self.mesh = mesh
        self.cfg = cfg
        self.lr_schedule = lr_schedule
        self.logger = MetricLogger(cfg.log_dir)
        self._data_shard = mesh_lib.data_sharding(mesh)

        def loss_fn(params, batch):
            return model.p_losses(params, batch["x0"], batch["t"],
                                  batch["cond"], batch["noise"],
                                  x_type=x_type, c_type=c_type)

        def one_step(params, opt_state, batch):
            if cfg.grad_acc > 1:
                # microbatch scan: batch dims are (grad_acc, micro, ...)
                def micro(carry, mb):
                    g_acc, l_acc = carry
                    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                        params, mb)
                    return (jax.tree.map(jnp.add, g_acc, grads), l_acc + loss), None

                zeros = jax.tree.map(jnp.zeros_like, params)
                (grads, loss), _ = jax.lax.scan(micro, (zeros, 0.0), batch)
                grads = jax.tree.map(lambda g: g / cfg.grad_acc, grads)
                loss = loss / cfg.grad_acc
                metrics = {}
            else:
                (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch)
            if train_mask is not None:
                grads = jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g),
                                     grads, train_mask)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))
            return params, opt_state, metrics

        self._step = jax.jit(one_step, donate_argnums=(0, 1))

    def init_state(self, params):
        from pfd_tpu.parallel.train import TrainState

        params = sharding.place_params(params, self.mesh)
        opt_state = jax.jit(self.optimizer.init)(params)
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        self.ema_state = ema_lib.init(params) if self.cfg.use_ema else None
        return state

    def resume(self, template_state):
        assert self.cfg.ckpt_dir, "resume needs ckpt_dir"
        state = ckpt_lib.restore_train_state(self.cfg.ckpt_dir, template_state)
        print_log(f"resumed from step {int(state.step)}")
        return state

    def place_batch(self, batch):
        if self.cfg.grad_acc > 1:
            # leading microbatch axis stays unsharded; batch axis is dim 1
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P(None, "data"))
        else:
            shard = self._data_shard
        return jax.tree.map(lambda a: jax.device_put(a, shard), batch)

    def fit(self, state, data_iter: Iterable, evaluator: Callable | None = None):
        """Run the loop. data_iter yields {'x0','cond','t','noise'} host batches."""
        cfg = self.cfg
        step = int(state.step)
        for batch in data_iter:
            if step >= cfg.max_steps:
                break
            batch = self.place_batch(batch)
            params, opt_state, metrics = self._step(state.params,
                                                    state.opt_state, batch)
            state = type(state)(params, opt_state, state.step + 1)
            step += 1
            if cfg.use_ema:
                self.ema_state = ema_lib.update(self.ema_state, state.params,
                                                cfg.ema_decay)
            self.logger.accumulate(metrics)
            if step % cfg.log_every == 0:
                rec = self.logger.tick(step)
                print_log(f"step {step}: " + ", ".join(
                    f"{k}={v:.4g}" for k, v in rec.items()
                    if isinstance(v, float) and k != "time"))
            if evaluator is not None and step % cfg.eval_every == 0:
                eval_params = (ema_lib.copy_to(self.ema_state, state.params)
                               if cfg.use_ema else state.params)
                eval_metrics = evaluator(eval_params, step)
                self.logger.tick(step, extra={f"eval/{k}": float(v)
                                              for k, v in (eval_metrics or {}).items()})
            if cfg.ckpt_dir and step % cfg.ckpt_every == 0:
                ckpt_lib.save_train_state(cfg.ckpt_dir, state, step)
        if cfg.ckpt_dir:
            ckpt_lib.save_train_state(cfg.ckpt_dir, state, step)
        return state
