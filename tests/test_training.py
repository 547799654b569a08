"""Training stack: sharded trainer loop, grad-acc, EMA, schedulers,
optimizer groups, orbax checkpoint round-trip — on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu import registry
from pfd_tpu.parallel import mesh as mesh_lib
from pfd_tpu.training import ema as ema_lib
from pfd_tpu.training import optimizers, schedulers
from pfd_tpu.training.harness import TrainConfig, Trainer

TINY_UNET = {
    "type": "openai_unet_2d_next",
    "args": dict(in_channels=4, out_channels=4, model_channels=32,
                 attention_resolutions=[1, 2], num_res_blocks=[1, 1],
                 channel_mult=[1, 2], num_heads=8, context_dim=64),
}


def make_model():
    return registry.get("pfd")(
        vae_cfg_list=[], ctx_cfg_list=[],
        diffuser_cfg_list=[["image", TINY_UNET]],
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)


def make_batch(rng, b=8, tokens=8):
    return {
        "x0": rng.standard_normal((b, 8, 8, 4)).astype(np.float32),
        "cond": rng.standard_normal((b, tokens, 64)).astype(np.float32),
        "t": rng.integers(0, 1000, (b,)).astype(np.int32),
        "noise": rng.standard_normal((b, 8, 8, 4)).astype(np.float32),
    }


def test_trainer_loop_and_checkpoint(tmp_path):
    model = make_model()
    mesh = mesh_lib.make_mesh(jax.devices(), tp=2)
    opt = optimizers.build_optimizer("adamw", {"lr": 1e-3}, grad_clip=1.0)
    cfg = TrainConfig(max_steps=4, log_every=2, ckpt_every=2, use_ema=True,
                      ckpt_dir=str(tmp_path / "ckpt"),
                      log_dir=str(tmp_path / "logs"))
    trainer = Trainer(model, opt, mesh, cfg)
    state = trainer.init_state(model.init(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    state = trainer.fit(state, (make_batch(rng) for _ in range(10)))
    assert int(state.step) == 4

    restored = trainer.resume(state)
    assert int(restored.step) == 4
    p0 = jax.tree.leaves(state.params)[0]
    r0 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(r0))
    assert (tmp_path / "logs" / "metrics.jsonl").exists()


def test_grad_accumulation():
    model = make_model()
    mesh = mesh_lib.make_mesh(jax.devices(), tp=1)
    opt = optimizers.build_optimizer("adam", {"lr": 1e-3})
    cfg = TrainConfig(max_steps=1, grad_acc=2)
    trainer = Trainer(model, opt, mesh, cfg)
    state = trainer.init_state(model.init(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(1)
    flat = make_batch(rng, b=16)
    micro = {k: v.reshape(2, 8, *v.shape[1:]) for k, v in flat.items()}
    state = trainer.fit(state, iter([micro]))
    assert int(state.step) == 1


def test_parameter_groups_freeze_vae():
    model = make_model()
    params = {"diffuser": {"image": {"time_embed": {"x": jnp.ones(3)},
                                     "data_blocks": {"x": jnp.ones(3)},
                                     "context_blocks": {"x": jnp.ones(3)}}},
              "vae": {"image": {"w": jnp.ones(3)}},
              "ctl": {"w": jnp.ones(3)}}
    labels = optimizers.pfd_parameter_groups(params)
    assert labels["vae"]["image"]["w"] == "frozen"
    assert labels["ctl"]["w"] == "ctl"
    assert labels["diffuser"]["image"]["time_embed"]["x"] == "diffuser_image_global"

    tx = optimizers.build_optimizer("adamw", {"lr": 1e-2}, labels=labels)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["vae"]["image"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["ctl"]["w"]).sum()) > 0.0


def test_ema_warmup_matches_reference_formula():
    params = {"w": jnp.zeros(4)}
    st = ema_lib.init(params)
    new = {"w": jnp.ones(4)}
    st = ema_lib.update(st, new, decay=0.9999)
    # n=1: decay = min(0.9999, 2/11); shadow = 0 - (1-d)*(0-1) = 1-d = 9/11
    expect = 1.0 - 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(st["shadow"]["w"]), expect, rtol=1e-6)


def test_scheduler_bank():
    s = schedulers.build({"type": "constant", "args": {"lr": 0.1, "step": 10}})
    assert s(5) == 0.1
    s = schedulers.build({"type": "poly", "args": {
        "start_lr": 1.0, "end_lr": 0.0, "power": 2, "step": 10}})
    assert abs(s(0) - 1.0) < 1e-9 and s(9) < 0.02
    s = schedulers.build([
        {"type": "constant", "args": {"lr": 1.0, "step": 5}},
        {"type": "linear", "args": {"start_lr": 1.0, "end_lr": 0.0, "step": 5}},
    ])
    assert s(2) == 1.0 and s(7) == pytest.approx(1.0 - 2 / 5)
    s = schedulers.build({"type": "stable_diffusion_linear", "args": {
        "base_lr": 1e-4, "warm_up_steps": [100], "f_min": [0.1], "f_max": [1.0],
        "f_start": [0.0], "cycle_lengths": [1000]}})
    assert s(0) == 0.0
    assert s(100) == pytest.approx(1e-4 * (0.1 + 0.9 * 0.9))


def test_kdiffusion_sampler_runs():
    from pfd_tpu.diffusion.kdiffusion import KDiffusionSampler

    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    ks = KDiffusionSampler(model)
    c = jnp.zeros((1, 8, 64))
    x = ks.sample_euler_ancestral(
        params, jax.random.PRNGKey(1), (1, 8, 8, 4),
        {"conditioning": c, "unconditional_conditioning": jnp.zeros_like(c),
         "unconditional_guidance_scale": 2.0}, steps=4)
    assert x.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(x)).all()


def test_train_mask_frozen_params_exact(tmp_path):
    """Frozen params must be BIT-identical after a step: adamw weight decay
    must not touch them (ADVICE r1: optax.masked, not just zeroed grads)."""
    from jax.tree_util import tree_map_with_path
    from pfd_tpu.parallel import train as train_lib

    model = make_model()
    mesh = mesh_lib.make_mesh(jax.devices(), tp=1)
    params = model.init(jax.random.PRNGKey(0))

    def trainable(path, _):
        names = [getattr(p, "key", str(p)) for p in path]
        return "context_blocks" not in names

    mask = tree_map_with_path(trainable, params)
    opt = train_lib.make_optimizer(lr=1e-2, weight_decay=0.1)
    init_state, step_fn = train_lib.make_train_step(
        model, opt, mesh, train_mask=mask, donate=False)
    state = init_state(params)
    before = jax.tree.map(np.asarray, state.params)

    batch = make_batch(np.random.default_rng(0))
    dshard = mesh_lib.data_sharding(mesh)
    bshard = mesh_lib.batch_only_sharding(mesh)
    batch = {
        "x0": jax.device_put(batch["x0"], dshard),
        "cond": jax.device_put(batch["cond"], bshard),
        "t": jax.device_put(batch["t"], bshard),
        "noise": jax.device_put(batch["noise"], dshard),
    }
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    after = jax.tree.map(np.asarray, state.params)

    frozen_same, trainable_changed = [], []
    def check(m, b, a):
        if m:
            trainable_changed.append(not np.array_equal(b, a))
        else:
            frozen_same.append(np.array_equal(b, a))
    jax.tree.map(check, mask, before, after)
    assert frozen_same and all(frozen_same), "frozen params were modified"
    assert any(trainable_changed), "trainable params never updated"
