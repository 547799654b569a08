"""Unit/activation registry with spec-string parsing.

Matches the reference's ``get_unit`` surface
(/root/reference/lib/model_zoo/common/utils.py:41-292): a name registry
resolved from spec strings like ``"lrelu_agc(alpha=0.1, gain=sqrt_2,
clamp=256)"`` — ``get_unit(spec)`` returns the registered unit (for a bare
name) or a ``functools.partial`` factory over the parsed kwargs. The
reference re-exports this registry but never calls it from any live path
(verified by grep — docs/PARITY.md); it is ported for registry-surface
completeness.

TPU-first shape: units are pure callables / small factory classes whose
state is precomputed jnp constants (the Fourier banks), not torch modules.
Dropout is inference-identity (the reference's nn.Dropout in eval mode);
training code should use explicit PRNG-keyed dropout from ops.nn.

Units (reference utils.py lines):
  none (45), relu/relu6/lrelu (48-50), dropout/dropout2d (51-52),
  sine (96-106) / relusine (108-115), lrelu_agc (117-149),
  se = SpatialEncoding log-spaced Fourier features (152-211),
  rffe = RFFEncoding random Fourier features (213-236).
The reference also registers the torch module classes nn.Conv2d/
nn.BatchNorm2d under 'conv'/'bn' (46-47); those are param-bearing layers
with no stateless functional analogue — this framework's convolutions and
norms live in ops.nn as explicit-params functions, so they are deliberately
not spec-string units here.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _str2value(v):
    """Reference utils.py:23-37 semantics: int, then float, then bool, else str."""
    v = v.strip()
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v in ("True", "true"):
        return True
    if v in ("False", "false"):
        return False
    return v


def _parse_kwargs(argstr):
    """Parse ``k=v, k2=(1,2), k3=[a,b]`` — the grammar utils.py:73-88 accepts."""
    kwargs = {}
    depth = 0
    parts, cur = [], []
    for ch in argstr:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    for part in parts:
        if not part.strip():
            continue
        k, _, v = part.partition("=")
        k, v = k.strip(), v.strip()
        if v[:1] == "(" and v[-1:] == ")":
            kwargs[k] = tuple(_str2value(i) for i in v[1:-1].split(","))
        elif v[:1] == "[" and v[-1:] == "]":
            kwargs[k] = [_str2value(i) for i in v[1:-1].split(",")]
        else:
            kwargs[k] = _str2value(v)
    return kwargs


_UNITS = {}


def register(name):
    def wrapper(obj):
        _UNITS[name] = obj
        return obj
    return wrapper


def get_unit(spec):
    """Resolve a unit spec string (reference utils.py:62-88).

    ``None``/'none' -> None; a bare name -> the registered unit factory; a
    name with an argument list -> ``functools.partial(factory,
    **parsed_kwargs)``. Every non-None result follows the reference's
    uniform resolve -> instantiate -> call contract: ``get_unit(spec)()``
    yields the callable (class units construct; function units return the
    function from a zero-arg factory), so spec-driven code can treat all
    units interchangeably.
    """
    if spec is None:
        return None
    i = spec.find("(")
    i = len(spec) if i == -1 else i
    unit = _UNITS[spec[:i].strip()]
    # slice off exactly one layer of parens: .strip('()') would also eat the
    # closing paren of a tuple value in final position, e.g. 'se(k=(1,2))'
    argstr = "" if i == len(spec) else spec[i + 1:spec.rfind(")")]
    if not argstr.strip():
        return unit
    return functools.partial(unit, **_parse_kwargs(argstr))


def _fn_unit(name, fn):
    """Register a plain function as a zero-arg factory so function units
    share the class units' instantiate-then-call contract."""
    register(name)(lambda: fn)
    return fn


register("none")(None)
relu = _fn_unit("relu", jax.nn.relu)
relu6 = _fn_unit("relu6", jax.nn.relu6)


@register("lrelu")
def lrelu(negative_slope=0.01):
    """Factory: lrelu(negative_slope=a)() -> leaky-relu callable."""
    return lambda x: jax.nn.leaky_relu(x, negative_slope)


@register("dropout")
@register("dropout2d")
def dropout_eval(p=0.5):
    """Inference-mode dropout = identity (the live reference runs eval())."""
    del p
    return lambda x: x


@register("sine")
class Sine:
    """sin(freq*x)*gain (reference utils.py:96-106)."""

    def __init__(self, freq, gain=1):
        self.freq, self.gain = freq, gain

    def __call__(self, x, gain=1):
        return jnp.sin(self.freq * x) * (self.gain * gain)

    def __repr__(self):
        return f"sine(freq={self.freq}, gain={self.gain})"


def relusine(x):
    """sin(30x) + relu(x) (reference utils.py:108-115)."""
    return jnp.sin(30.0 * x) + jax.nn.relu(x)


_fn_unit("relusine", relusine)


@register("lrelu_agc")
class LReluAGC:
    """Leaky ReLU with alpha / gain / clamp (reference utils.py:117-149).

    ``gain='sqrt_2'`` resolves to sqrt(2); clamp scales with the call-time
    gain, exactly as the reference does.
    """

    def __init__(self, alpha=0.1, gain=1, clamp=None):
        self.alpha = alpha
        self.gain = float(np.sqrt(2)) if gain == "sqrt_2" else gain
        self.clamp = clamp

    def __call__(self, x, gain=1):
        x = jax.nn.leaky_relu(x, self.alpha)
        act_gain = self.gain * gain
        if act_gain != 1:
            x = x * act_gain
        if self.clamp is not None:
            c = self.clamp * gain
            x = jnp.clip(x, -c, c)
        return x

    def __repr__(self):
        return (f"lrelu_agc(alpha={self.alpha}, gain={self.gain}, "
                f"clamp={self.clamp})")


@register("se")
class SpatialEncoding:
    """Log-spaced Fourier spatial encoding (reference utils.py:152-211).

    emb rows are 2**linspace(0, sigma, out_dim/2/in_dim) frequencies placed
    per input dimension (the reference builds this with a roll/concat);
    forward is ``cat([x,] sin(x @ emb.T), cos(x @ emb.T))``. Accepts
    ``(n, c)`` inputs or NHWC feature maps via ``format='[bs x c x 2D]'``
    (the reference's NCHW permute becomes a plain NHWC reshape here).
    """

    def __init__(self, in_dim, out_dim, sigma=6, cat_input=True,
                 require_grad=False):
        assert out_dim % (2 * in_dim) == 0, "dimension must be dividable"
        n = out_dim // 2 // in_dim
        m = 2.0 ** np.linspace(0, sigma, n)
        m = np.stack([m] + [np.zeros_like(m)] * (in_dim - 1), axis=-1)
        m = np.concatenate([np.roll(m, i, axis=-1) for i in range(in_dim)],
                           axis=0)
        self.emb = jnp.asarray(m, jnp.float32)
        self.in_dim, self.out_dim, self.sigma = in_dim, out_dim, sigma
        self.cat_input = cat_input
        self.require_grad = require_grad  # trainable emb: export via params()

    def params(self):
        """The trainable leaf when require_grad (functional-JAX equivalent
        of the reference's nn.Parameter): pass back via __call__(emb=...)."""
        return {"emb": self.emb}

    def __call__(self, x, format="[n x c]", emb=None):
        emb = self.emb if emb is None else emb
        shape = x.shape
        if format == "[bs x c x 2D]":
            x = x.reshape(-1, shape[-1])  # NHWC: channels last already
        elif format != "[n x c]":
            raise ValueError(format)
        y = x @ emb.T
        cols = ([x] if self.cat_input else []) + [jnp.sin(y), jnp.cos(y)]
        z = jnp.concatenate(cols, axis=-1)
        if format == "[bs x c x 2D]":
            z = z.reshape(*shape[:-1], z.shape[-1])
        return z


@register("rffe")
class RFFEncoding(SpatialEncoding):
    """Random Fourier features (reference utils.py:213-236): emb ~ N(0, sigma).

    The reference draws from global NumPy RNG state; here the draw is keyed
    (seed arg, default 0) — explicit-PRNG JAX convention, same distribution.
    """

    def __init__(self, in_dim, out_dim, sigma=6, cat_input=True,
                 require_grad=False, seed=0):
        super().__init__(in_dim, out_dim, sigma, cat_input, require_grad)
        rng = np.random.default_rng(seed)
        self.emb = jnp.asarray(
            rng.normal(0.0, sigma, size=(out_dim // 2, in_dim)), jnp.float32)
