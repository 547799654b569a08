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
    # tanh-approximate GELU in the UNet GEGLU FF. The approximation error
    # (max ~3e-3 near |x|=2) is below bf16 quantization (~8e-3 relative at
    # that magnitude), while the exact erf costs ~1 ms per context block on
    # v5e (measured: 2.53 -> 1.52 ms per ds=1 FF). Exact in the FP32 policy
    # so parity tests still match torch nn.GELU bit-for-bit.
    gelu_approx: bool = True

    def cast(self, x):
        return x.astype(self.compute_dtype)


# fp32 everywhere — used by parity tests against the CPU fp32 reference.
FP32 = Policy(
    compute_dtype=jnp.float32,
    param_dtype=jnp.float32,
    norm_dtype=jnp.float32,
    softmax_dtype=jnp.float32,
    gelu_approx=False,
)

# TPU production policy.
BF16 = Policy()

DEFAULT = BF16
