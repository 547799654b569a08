"""Optimizer factory — sgd/adam/adamw with named parameter groups.

Parity with the reference factory (lib/model_zoo/common/get_optimizer.py:14-47):
honors a model's parameter_group partitioning (pfd exposes
diffuser_image_{global,data,context} + ctl, pfd.py:94-98, 464) via
optax.multi_transform, with per-group lr scaling equivalent to the
scheduler's pg_lrscale (get_scheduler.py:56-70).
"""

from __future__ import annotations

import jax
import optax

_FACTORIES = {
    "sgd": lambda lr, momentum=0.0, weight_decay=0.0, **kw:
        optax.sgd(lr, momentum=momentum),
    "adam": lambda lr, betas=(0.9, 0.999), eps=1e-8, **kw:
        optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps),
    "adamw": lambda lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01, **kw:
        optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                    weight_decay=weight_decay),
}


def pfd_parameter_groups(params) -> dict:
    """Label pytree for the composite pfd params, mirroring pfd.py:94-98/464:
    diffuser time_embed -> '<g>_global', data_blocks -> '<g>_data',
    context_blocks -> '<g>_context', ctl -> 'ctl'; vae/ctx frozen."""
    def label(path, _):
        names = [getattr(p, "key", str(p)) for p in path]
        if names[0] == "diffuser":
            mod = names[1]
            if names[2] == "time_embed":
                return f"diffuser_{mod}_global"
            if names[2] == "data_blocks":
                return f"diffuser_{mod}_data"
            if names[2] == "context_blocks":
                return f"diffuser_{mod}_context"
            return f"diffuser_{mod}_other"
        if names[0] == "ctl":
            return "ctl"
        return "frozen"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(opt_type, args, *, labels=None, lr_scales=None,
                    learning_rate=None, grad_clip=None):
    """Build an optax transform. ``labels``: label pytree (from
    pfd_parameter_groups); ``lr_scales``: {label: scale}; 'frozen' label gets
    zero updates. ``learning_rate`` may be a float or a step->lr callable."""
    args = dict(args)
    lr = learning_rate if learning_rate is not None else args.pop("lr", 1e-4)
    args.pop("lr", None)
    factory = _FACTORIES[opt_type]

    def make(scale=1.0):
        if callable(lr):
            return factory(lambda step: lr(step) * scale, **args)
        return factory(lr * scale, **args)

    if labels is None:
        tx = make()
    else:
        scales = lr_scales or {}
        label_set = set(jax.tree.leaves(labels))
        transforms = {}
        for name in label_set:
            if name == "frozen":
                transforms[name] = optax.set_to_zero()
            else:
                transforms[name] = make(scales.get(name, 1.0))
        tx = optax.multi_transform(transforms, labels)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
