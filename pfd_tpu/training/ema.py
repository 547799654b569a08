"""Functional EMA — parity with the reference LitEma (lib/model_zoo/ema.py):
warmup decay min(decay, (1+n)/(10+n)), shadow copy, copy_to/store/restore
become pure pytree ops (store/restore are just holding a reference)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init(params):
    # deep copy: params buffers may be donated by the train step
    return {"shadow": jax.tree.map(lambda x: jnp.array(x, copy=True), params),
            "num_updates": jnp.zeros((), jnp.int32)}


def update(ema_state, params, decay=0.9999, use_num_updates=True):
    n = ema_state["num_updates"] + 1
    if use_num_updates:
        d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    else:
        d = jnp.asarray(decay, jnp.float32)
    one_minus = (1.0 - d).astype(jnp.float32)

    def upd(s, p):
        return (s.astype(jnp.float32)
                - one_minus * (s.astype(jnp.float32) - p.astype(jnp.float32))
                ).astype(s.dtype)

    return {"shadow": jax.tree.map(upd, ema_state["shadow"], params),
            "num_updates": n}


def copy_to(ema_state, params):
    """Return params with EMA shadows swapped in (same dtypes as params)."""
    return jax.tree.map(lambda s, p: s.astype(p.dtype),
                        ema_state["shadow"], params)
