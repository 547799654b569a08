"""VAE training losses — LPIPS + PatchGAN discriminator (JAX).

Capability parity with reference lib/model_zoo/autokl_utils.py: VGG16 LPIPS
perceptual metric (:228-293), NLayerDiscriminator (:101-155), hinge/vanilla
GAN losses (:302-313), and the LPIPSWithDiscriminator two-optimizer protocol
(:294-400) — reformulated as pure loss functions. The adaptive generator
weight (autokl_utils.py:320-331: ratio of nll/g gradient norms at the
decoder's last layer) is computed with jax.grad instead of
torch.autograd.grad.

VGG16/LPIPS weights load from torchvision/lpips checkpoints via the generic
converter (no torchvision at runtime — the conv stack is defined here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu.ops import nn

# VGG16 feature config (torchvision .features indices -> conv channels),
# sliced at relu1_2/2_2/3_3/4_3/5_3 as in autokl_utils.py:178-217.
_VGG_SLICES = [
    [(0, 3, 64), (2, 64, 64)],
    [(5, 64, 128), (7, 128, 128)],
    [(10, 128, 256), (12, 256, 256), (14, 256, 256)],
    [(17, 256, 512), (19, 512, 512), (21, 512, 512)],
    [(24, 512, 512), (26, 512, 512), (28, 512, 512)],
]
_LPIPS_CHNS = [64, 128, 256, 512, 512]


def init_lpips(key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 32))
    params = {"net": {}, "lins": {}}
    for si, convs in enumerate(_VGG_SLICES):
        for idx, cin, cout in convs:
            params["net"][f"slice{si + 1}"] = params["net"].get(f"slice{si + 1}", {})
            params["net"][f"slice{si + 1}"][str(idx)] = nn.init_conv(
                next(keys), 3, 3, cin, cout, dtype)
    for i, c in enumerate(_LPIPS_CHNS):
        params["lins"][f"lin{i}"] = {
            "kernel": nn.init_conv(next(keys), 1, 1, c, 1, dtype)["kernel"]}
    return params


def _vgg_features(params, x):
    """x: NHWC in LPIPS-scaled space. Returns 5 feature maps."""
    outs = []
    h = x
    for si in range(5):
        if si > 0:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        for idx, cin, cout in _VGG_SLICES[si]:
            h = jax.nn.relu(nn.conv2d(h, params[f"slice{si + 1}"][str(idx)],
                                      padding=1))
        outs.append(h)
    return outs


_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips(params, x, y):
    """Perceptual distance; x, y: NHWC in [-1, 1]. Returns (B,)."""
    xs = (x - _SHIFT) / _SCALE
    ys = (y - _SHIFT) / _SCALE
    fx = _vgg_features(params["net"], xs)
    fy = _vgg_features(params["net"], ys)
    val = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        d = nn.conv2d(d, {"kernel": params["lins"][f"lin{i}"]["kernel"]}, padding=0)
        val = val + d.mean(axis=(1, 2, 3))
    return val


# ---------------------------------------------------------------------------
# PatchGAN discriminator
# ---------------------------------------------------------------------------

def init_discriminator(key, input_nc=3, ndf=64, n_layers=3, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16))
    params = {"0": nn.init_conv(next(keys), 4, 4, input_nc, ndf, dtype)}
    seq_idx = 2
    nf = 1
    for n in range(1, n_layers + 1):
        nf_prev, nf = nf, min(2 ** n, 8)
        params[str(seq_idx)] = {
            "kernel": nn.init_conv(next(keys), 4, 4, ndf * nf_prev,
                                   ndf * nf, dtype)["kernel"]}
        params[str(seq_idx + 1)] = {
            "scale": jnp.ones((ndf * nf,), dtype),
            "bias": jnp.zeros((ndf * nf,), dtype),
            "running_mean": jnp.zeros((ndf * nf,), dtype),
            "running_var": jnp.ones((ndf * nf,), dtype),
        }
        seq_idx += 3
    params[str(seq_idx)] = nn.init_conv(next(keys), 4, 4, ndf * nf, 1, dtype)
    return params


def discriminator(params, x, n_layers=3):
    """NLayerDiscriminator forward (autokl_utils.py:101-155); BN uses running
    stats (inference-mode here; GAN-training BN stats are a known torch/JAX
    divergence — ActNorm variant recommended for training)."""
    h = nn.conv2d(x, params["0"], stride=2, padding=1)
    h = jax.nn.leaky_relu(h, 0.2)
    seq_idx = 2
    for n in range(1, n_layers + 1):
        stride = 2 if n < n_layers else 1
        h = nn.conv2d(h, {"kernel": params[str(seq_idx)]["kernel"]},
                      stride=stride, padding=1)
        h = nn.batch_norm(h, params[str(seq_idx + 1)])
        h = jax.nn.leaky_relu(h, 0.2)
        seq_idx += 3
    return nn.conv2d(h, params[str(seq_idx)], padding=1)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    return jnp.where(global_step < threshold, value, weight)


def generator_loss(loss_params, vae, vae_params, inputs, rng, *, global_step,
                   kl_weight=1.0, perceptual_weight=1.0, disc_factor=1.0,
                   disc_weight=1.0, disc_start=0, logvar=0.0):
    """Generator-side objective (optimizer_idx==0, autokl_utils.py:333-383):
    L1 + LPIPS + logvar-weighted NLL + KL + adaptive-weighted GAN term.

    The adaptive weight uses gradient norms of nll/g losses w.r.t. the
    decoder's final conv kernel (autokl_utils.py:320-331)."""
    mean, log_var = vae.encode_moments(vae_params, inputs)
    std = jnp.exp(0.5 * log_var.astype(jnp.float32)).astype(mean.dtype)
    z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    recon = vae.decode(vae_params, z, clamp=False) * 2 - 1  # [-1,1]
    target = inputs * 2 - 1

    rec = jnp.abs(target - recon)
    if perceptual_weight > 0:
        p = lpips(loss_params["lpips"], target, recon)
        rec = rec + perceptual_weight * p.reshape(-1, 1, 1, 1)
    nll = (rec / jnp.exp(logvar) + logvar).sum() / inputs.shape[0]
    kl = vae.kl(mean, log_var).sum() / inputs.shape[0]

    logits_fake = discriminator(loss_params["discriminator"], recon)
    g_loss = -jnp.mean(logits_fake)

    def nll_of_last(kernel):
        vp = jax.tree_util.tree_map(lambda x: x, vae_params)
        vp["decoder"]["conv_out"]["kernel"] = kernel
        r = vae.decode(vp, z, clamp=False) * 2 - 1
        rc = jnp.abs(target - r)
        if perceptual_weight > 0:
            rc = rc + perceptual_weight * lpips(
                loss_params["lpips"], target, r).reshape(-1, 1, 1, 1)
        return (rc / jnp.exp(logvar) + logvar).sum() / inputs.shape[0]

    def g_of_last(kernel):
        vp = jax.tree_util.tree_map(lambda x: x, vae_params)
        vp["decoder"]["conv_out"]["kernel"] = kernel
        r = vae.decode(vp, z, clamp=False) * 2 - 1
        return -jnp.mean(discriminator(loss_params["discriminator"], r))

    last = vae_params["decoder"]["conv_out"]["kernel"]
    nll_g = jnp.linalg.norm(jax.grad(nll_of_last)(last))
    gan_g = jnp.linalg.norm(jax.grad(g_of_last)(last))
    d_weight = jnp.clip(nll_g / (gan_g + 1e-4), 0.0, 1e4) * disc_weight
    df = adopt_weight(disc_factor, global_step, disc_start)
    loss = nll + kl_weight * kl + d_weight * df * g_loss
    return loss, {"nll_loss": nll, "kl_loss": kl, "g_loss": g_loss,
                  "d_weight": d_weight}


def discriminator_loss(loss_params, vae, vae_params, inputs, rng, *,
                       global_step, disc_factor=1.0, disc_start=0,
                       disc_loss="hinge"):
    """Discriminator-side objective (optimizer_idx==1, autokl_utils.py:385-400)."""
    mean, log_var = vae.encode_moments(vae_params, inputs)
    std = jnp.exp(0.5 * log_var.astype(jnp.float32)).astype(mean.dtype)
    z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    recon = jax.lax.stop_gradient(vae.decode(vae_params, z, clamp=False) * 2 - 1)
    target = inputs * 2 - 1

    logits_real = discriminator(loss_params["discriminator"], target)
    logits_fake = discriminator(loss_params["discriminator"], recon)
    fn = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
    df = adopt_weight(disc_factor, global_step, disc_start)
    d = df * fn(logits_real, logits_fake)
    return d, {"disc_loss": d, "logits_real": logits_real.mean(),
               "logits_fake": logits_fake.mean()}
