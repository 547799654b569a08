"""Dtype policy for TPU execution.

The reference runs fp16 end-to-end on CUDA (reference app.py:117-123 ``net.half()``).
On TPU the idiomatic equivalent is bfloat16 compute with fp32 normalization /
softmax accumulation (the MXU natively accumulates bf16 matmuls in fp32).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Controls per-op dtypes.

    compute_dtype: dtype of activations flowing through matmuls/convs.
    param_dtype:   dtype parameters are stored in (HBM residency).
    norm_dtype:    accumulation dtype for GroupNorm/LayerNorm statistics.
    softmax_dtype: accumulation dtype for attention softmax.
    """

    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    softmax_dtype: jnp.dtype = jnp.float32

    def cast(self, x):
        return x.astype(self.compute_dtype)


# fp32 everywhere — used by parity tests against the CPU fp32 reference.
FP32 = Policy(
    compute_dtype=jnp.float32,
    param_dtype=jnp.float32,
    norm_dtype=jnp.float32,
    softmax_dtype=jnp.float32,
)

# TPU production policy.
BF16 = Policy()

DEFAULT = BF16
