"""k-diffusion-style sigma-space samplers (Euler / Euler-ancestral).

Capability parity with the reference `Sampler` (lib/model_zoo/sampler.py:29-104)
— which is vestigial and broken there (undefined `timesteps`/`self.model` at
sampler.py:67-70, wrong apply_model signature at :95). This is the *working*
equivalent: the same t_to_sigma / get_sigmas / Euler-ancestral math, wired to
the pfd apply_model contract, with the loop as a lax.scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class KDiffusionSampler:
    def __init__(self, model):
        self.model = model
        s = model.schedule
        self.sigmas_full = np.sqrt((1 - s.alphas_cumprod) / s.alphas_cumprod)
        self.log_sigmas = np.log(self.sigmas_full)

    def t_to_sigma(self, t):
        """Continuous-t interpolation of log-sigmas (sampler.py:38-43)."""
        t = np.asarray(t, np.float64)
        low_idx = np.floor(t).astype(int)
        high_idx = np.ceil(t).astype(int)
        w = t - low_idx
        return np.exp((1 - w) * self.log_sigmas[low_idx]
                      + w * self.log_sigmas[high_idx])

    def get_sigmas(self, n):
        """n+1 descending sigmas ending at 0 (sampler.py:45-49)."""
        t_max = len(self.sigmas_full) - 1
        t = np.linspace(t_max, 0, n)
        return np.append(self.t_to_sigma(t), 0.0)

    def sigma_to_t(self, sigma):
        """Nearest-neighbor inverse used to drive the eps model."""
        log_sigma = np.log(np.maximum(sigma, 1e-20))
        return np.abs(self.log_sigmas[None, :] - log_sigma[:, None]).argmin(axis=1)

    def _eps(self, params, x, sigma, t_int, c_info, x_type, c_type):
        """denoised = x - sigma * eps(x / sqrt(1+sigma^2), t)."""
        b = x.shape[0]
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
        ts = jnp.full((b,), t_int, jnp.int32)
        cond = c_info["conditioning"]
        uncond = c_info.get("unconditional_conditioning")
        scale = c_info.get("unconditional_guidance_scale", 1.0)
        ci = {"type": c_type, "c": cond}
        if uncond is None:
            eps = self.model.apply_model(params, {"type": x_type, "x": x * c_in},
                                         ts, ci).astype(jnp.float32)
            return eps * scale
        x_in = jnp.concatenate([x, x]) * c_in
        t_in = jnp.concatenate([ts, ts])
        ci = {"type": c_type, "c": jnp.concatenate([uncond, cond])}
        e = self.model.apply_model(params, {"type": x_type, "x": x_in}, t_in,
                                   ci).astype(jnp.float32)
        e_uc, e_c = jnp.split(e, 2)
        return e_uc + scale * (e_c - e_uc)

    def sample_euler_ancestral(self, params, rng, shape, c_info, steps=50,
                               x_type="image", c_type="image", eta=1.0):
        """Euler-ancestral in sigma space (sampler.py:80-104 semantics)."""
        sigmas = self.get_sigmas(steps)
        t_ints = self.sigma_to_t(sigmas[:-1])

        rng, init = jax.random.split(rng)
        x = jax.random.normal(init, shape, jnp.float32) * sigmas[0]

        rows = jnp.asarray(np.stack([
            sigmas[:-1], sigmas[1:], t_ints.astype(np.float64)], axis=1),
            jnp.float32)

        def step(carry, row):
            x, key = carry
            sigma, sigma_next, t_int = row[0], row[1], row[2]
            eps = self._eps(params, x, sigma, t_int.astype(jnp.int32), c_info,
                            x_type, c_type)
            denoised = x - sigma * eps
            # ancestral split of the step variance
            sigma_up = jnp.minimum(
                sigma_next,
                eta * jnp.sqrt(jnp.maximum(
                    sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2)
                    / jnp.maximum(sigma ** 2, 1e-20), 0.0)))
            sigma_down = jnp.sqrt(jnp.maximum(sigma_next ** 2 - sigma_up ** 2, 0.0))
            d = (x - denoised) / sigma
            x = x + d * (sigma_down - sigma)
            key, nkey = jax.random.split(key)
            noise = jax.random.normal(nkey, x.shape, jnp.float32)
            x = x + noise * sigma_up
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, rng), rows)
        return x
