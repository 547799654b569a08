"""pfd_tpu — a TPU-native (JAX/XLA/Pallas) Prompt-Free Diffusion framework.

A ground-up reimplementation of the capabilities of SHI-Labs/Prompt-Free-Diffusion
(reference: /root/reference) designed for TPU:

- pure-functional models over parameter pytrees (no module runtime),
- static block plans traced once under ``jax.jit``,
- the full DDIM denoise loop as a single ``lax.scan`` XLA program,
- Pallas flash-attention for the long-sequence spatial self-attention,
- SPMD serving/training via ``jax.sharding.Mesh`` + NamedSharding.

Public surface mirrors the reference's capabilities (reference app.py:212-275):
``pfd_tpu.pipeline.PromptFreeDiffusionPipeline`` is the serving facade.
"""

__version__ = "0.1.0"

from pfd_tpu import config  # noqa: F401
