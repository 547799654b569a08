"""Tracing / profiling — the observability layer the reference lacks.

Reference has only a thop FLOP hook and wall-clock timers (SURVEY §5).
Here: jax.profiler trace capture (viewable in TensorBoard/Perfetto),
per-phase wall timers with device sync, and a simple FLOP estimator for the
UNet plan (the working equivalent of count_flops_attn, openaimodel.py:326-343).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with profiling.trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase timing with device synchronization."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.phases.values()) or 1.0
        return " | ".join(f"{k}: {v * 1e3:.1f}ms ({v / total:.0%})"
                          for k, v in sorted(self.phases.items(),
                                             key=lambda kv: -kv[1]))


def unet_flops(plan, h, w, batch=1, ctx_len=148):
    """FLOP estimate for one UNet forward at latent (h, w): convs + attention
    (self-attn 4*S^2*C per block, count_flops_attn semantics x2 matmuls,
    openaimodel.py:326-343; cross-attn 4*S*ctx_len*C; projections/FF 2*S*...)."""
    total = 0
    res = (h, w)
    for op in plan.ops:
        if op[0] == "d":
            spec = plan.data_specs[op[1]]
            hh, ww = res
            if spec.kind in ("conv_in", "out"):
                total += 2 * batch * hh * ww * 9 * spec.cin * spec.cout
            elif spec.kind == "res":
                total += 2 * batch * hh * ww * 9 * (spec.cin * spec.cout
                                                    + spec.cout ** 2)
                if spec.cin != spec.cout:
                    total += 2 * batch * hh * ww * spec.cin * spec.cout
            elif spec.kind == "down":
                res = (hh // 2, ww // 2)
                total += 2 * batch * res[0] * res[1] * 9 * spec.cin * spec.cout
            elif spec.kind == "up":
                res = (hh * 2, ww * 2)
                total += 2 * batch * res[0] * res[1] * 9 * spec.cin * spec.cout
        elif op[0] == "c":
            spec = plan.context_specs[op[1]]
            s = res[0] * res[1]
            c = spec.ch
            total += 4 * batch * s * s * c            # self-attn qk + pv
            total += 4 * batch * s * ctx_len * c      # cross-attn
            total += 2 * batch * s * c * c * 8        # qkv/out projections + GEGLU FF
    return total
