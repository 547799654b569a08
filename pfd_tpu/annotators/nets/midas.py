"""MiDaS DPT-Hybrid depth annotator — full JAX port.

Capability parity with the reference midas annotator (controlnet_annotator/
midas/): DPTDepthModel with the `vitb_rn50_384` hybrid backbone
(dpt_depth.py:26-110, vit.py:343-476), depth + Sobel-normal outputs
(midas/__init__.py:15-46).

The reference builds its backbone via timm (vit.py:3), which is not present
in this environment — the backbone (ResNetV2-50 stem with weight-standardized
convs + ViT-Base with resizable position embeddings + DPT readout/reassemble)
is implemented here from scratch, with parameter names matching the
dpt_hybrid-midas checkpoint layout so released weights load via the generic
converter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu.annotators.nets import load_torch_params, pretrained_path
from pfd_tpu.io.convert import torch_sd_to_pytree
from pfd_tpu.ops import nn

# ResNetV2-50 stem stages used by the hybrid: (blocks, mid, out, stride)
_RN_STAGES = [(3, 64, 256, 1), (4, 128, 512, 2), (9, 256, 1024, 2)]
_VIT_DEPTH, _VIT_DIM, _VIT_HEADS = 12, 768, 12
_HOOKS = (8, 11)  # transformer blocks tapped for layer_3 / layer_4
_FEATURES = 256


def _std_conv(p, x, *, stride=1, padding="SAME"):
    """Weight-standardized conv (timm StdConv2dSame)."""
    w = p["kernel"].astype(jnp.float32)
    mean = w.mean((0, 1, 2), keepdims=True)
    var = w.var((0, 1, 2), keepdims=True)
    w = ((w - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
    q = {"kernel": w}
    if "bias" in p:
        q["bias"] = p["bias"]
    return nn.conv2d(x, q, stride=stride, padding=padding)


def _gn_relu(p, x, relu=True):
    x = nn.group_norm(x, p, groups=32, eps=1e-5)
    return jax.nn.relu(x) if relu else x


def _bottleneck(p, x, stride):
    """timm ResNetV2 Bottleneck (preact=False): conv-GN-ReLU x3 + shortcut."""
    if "downsample" in p:
        shortcut = _std_conv(p["downsample"]["conv"], x, stride=stride)
        shortcut = _gn_relu(p["downsample"]["norm"], shortcut, relu=False)
    else:
        shortcut = x
    h = _gn_relu(p["norm1"], _std_conv(p["conv1"], x))
    h = _gn_relu(p["norm2"], _std_conv(p["conv2"], h, stride=stride))
    h = _gn_relu(p["norm3"], _std_conv(p["conv3"], h), relu=False)
    return jax.nn.relu(h + shortcut)


def _rn_backbone(p, x):
    """Stem + 3 stages; returns (stage0 act, stage1 act, final)."""
    h = _std_conv(p["stem"]["conv"], x, stride=2)
    h = _gn_relu(p["stem"]["norm"], h)
    # maxpool 3x3 stride 2, SAME padding
    h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=-jnp.inf)
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "VALID")
    feats = []
    for si, (nblk, mid, out, stride) in enumerate(_RN_STAGES):
        stage = p["stages"][str(si)]["blocks"]
        for bi in range(nblk):
            h = _bottleneck(stage[str(bi)], h, stride if bi == 0 else 1)
        feats.append(h)
    return feats[0], feats[1], feats[2]


def _vit_block(p, x, policy_dtype=jnp.float32, heads=_VIT_HEADS):
    h = nn.layer_norm(x, p["norm1"])
    qkv = nn.linear(h, p["attn"]["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = nn.split_heads(q, heads)
    k = nn.split_heads(k, heads)
    v = nn.split_heads(v, heads)
    o = nn.dot_product_attention(q, k, v)
    x = x + nn.linear(nn.merge_heads(o), p["attn"]["proj"])
    h = nn.layer_norm(x, p["norm2"])
    h = nn.linear(h, p["mlp"]["fc1"])
    h = nn.gelu(h)
    return x + nn.linear(h, p["mlp"]["fc2"])


def _resize_pos_embed(pos_embed, gh, gw):
    """vit.py:100-115: bilinear-resize grid part, keep cls token.
    antialias=False matches torch F.interpolate's plain bilinear when the
    target grid is SMALLER than the stored one (jax antialiases
    minification by default; torch never does)."""
    tok, grid = pos_embed[:, :1], pos_embed[0, 1:]
    gs = int(np.sqrt(grid.shape[0]))
    grid = grid.reshape(1, gs, gs, -1)
    grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), "bilinear",
                            antialias=False)
    return jnp.concatenate([tok, grid.reshape(1, gh * gw, -1)], axis=1)


def _project_readout(p, x):
    """ProjectReadout (vit.py:31-42): concat cls token, linear+gelu."""
    readout = jnp.broadcast_to(x[:, :1], x[:, 1:].shape)
    feats = jnp.concatenate([x[:, 1:], readout], axis=-1)
    return nn.gelu(nn.linear(feats, p["0"]))


def _rcu(p, x):
    """ResidualConvUnit_custom (blocks.py:231-289, bn=False)."""
    h = jax.nn.relu(x)
    h = nn.conv2d(h, p["conv1"], padding=1)
    h = jax.nn.relu(h)
    h = nn.conv2d(h, p["conv2"], padding=1)
    return h + x


def _up2_align(x):
    b, h, w, c = x.shape
    from pfd_tpu.annotators.nets.mlsd import _upsample2x_align_corners

    return _upsample2x_align_corners(x)


def _fusion(p, x, skip=None):
    """FeatureFusionBlock_custom (blocks.py:291-341)."""
    if skip is not None:
        x = x + _rcu(p["resConfUnit1"], skip)
    x = _rcu(p["resConfUnit2"], x)
    x = _up2_align(x)
    return nn.conv2d(x, p["out_conv"], padding=0)


def dpt_decode(sc, layer_1, layer_2, layer_3, layer_4):
    """DPT decoder: scratch RN convs + 4 fusion stages + output head
    (dpt_depth.py:57-101). Parity-tested against the reference's own
    blocks.py modules (timm-free) with shared random weights at reduced
    width — tests/test_annotators.py."""
    l1 = nn.conv2d(layer_1, sc["layer1_rn"], padding=1)
    l2 = nn.conv2d(layer_2, sc["layer2_rn"], padding=1)
    l3 = nn.conv2d(layer_3, sc["layer3_rn"], padding=1)
    l4 = nn.conv2d(layer_4, sc["layer4_rn"], padding=1)

    p4 = _fusion(sc["refinenet4"], l4)
    p3 = _fusion(sc["refinenet3"], p4, l3)
    p2 = _fusion(sc["refinenet2"], p3, l2)
    p1 = _fusion(sc["refinenet1"], p2, l1)

    # head (dpt_depth.py:92-101)
    oc = sc["output_conv"]
    h = nn.conv2d(p1, oc["0"], padding=1)
    h = _up2_align(h)
    h = nn.conv2d(h, oc["2"], padding=1)
    h = jax.nn.relu(h)
    h = nn.conv2d(h, oc["4"], padding=0)
    h = jax.nn.relu(h)  # non_negative
    return h[:, :, :, 0]


def vit_forward_flex(params, x, *, heads, patch):
    """Plain-ViT forward_flex (reference vit.py:117-152): conv patch embed,
    cls token, interpolated position embedding (vit.py:100-115), pre-norm
    blocks, final LayerNorm. The hybrid backbone swaps the patch embed for
    the ResNet stage (vit.py:127-129); this is the plain path, parity-tested
    against the reference's OWN forward_flex at reduced width
    (tests/test_annotators.py)."""
    b, H, W, _ = x.shape
    h = nn.conv2d(x, params["patch_embed"]["proj"], stride=patch, padding=0)
    gh, gw = h.shape[1], h.shape[2]
    dim = h.shape[-1]
    tokens = h.reshape(b, gh * gw, dim)
    cls = jnp.broadcast_to(params["cls_token"].reshape(1, 1, dim)
                           .astype(h.dtype), (b, 1, dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + _resize_pos_embed(params["pos_embed"].astype(h.dtype),
                                        gh, gw)
    for i in range(len(params["blocks"])):
        tokens = _vit_block(params["blocks"][str(i)], tokens, heads=heads)
    return nn.layer_norm(tokens, params["norm"])


@jax.jit
def dpt_hybrid_forward(params, x):
    """x: (1, H, W, 3) normalized (x/127.5 - 1), H/W multiples of 32.
    Returns (1, H, W) inverse depth."""
    b, H, W, _ = x.shape
    pm = params["pretrained"]["model"]

    layer_1, layer_2, feat = _rn_backbone(pm["patch_embed"]["backbone"], x)

    h = nn.conv2d(feat, pm["patch_embed"]["proj"], padding=0)  # 1024 -> 768
    gh, gw = h.shape[1], h.shape[2]
    tokens = h.reshape(b, gh * gw, _VIT_DIM)
    cls = jnp.broadcast_to(pm["cls_token"].reshape(1, 1, _VIT_DIM).astype(h.dtype),
                           (b, 1, _VIT_DIM))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + _resize_pos_embed(pm["pos_embed"].astype(h.dtype), gh, gw)

    acts = {}
    t = tokens
    for i in range(_VIT_DEPTH):
        t = _vit_block(pm["blocks"][str(i)], t)
        if i in _HOOKS:
            acts[i] = t
    # (final norm applied only to the classifier path, unused by DPT)

    pp = params["pretrained"]

    def reassemble(act, post, extra_conv=False):
        y = _project_readout(post["0"]["project"], act)
        y = y.reshape(b, gh, gw, _VIT_DIM)
        y = nn.conv2d(y, post["3"], padding=0)
        if extra_conv:
            y = nn.conv2d(y, post["4"], stride=2, padding=1)
        return y

    layer_3 = reassemble(acts[_HOOKS[0]], pp["act_postprocess3"])
    layer_4 = reassemble(acts[_HOOKS[1]], pp["act_postprocess4"], extra_conv=True)

    return dpt_decode(params["scratch"], layer_1, layer_2, layer_3, layer_4)


def init_params(key, dtype=jnp.float32):
    """Random-init DPT-hybrid params (for tests / shape checks; production
    loads the dpt_hybrid-midas checkpoint)."""
    keys = iter(jax.random.split(key, 512))

    def conv(ks, cin, cout, bias=True, zero=False):
        return nn.init_conv(next(keys), ks, ks, cin, cout, dtype, zero=zero) \
            if bias else {"kernel": nn.init_conv(next(keys), ks, ks, cin, cout, dtype)["kernel"]}

    def lin(cin, cout):
        return nn.init_linear(next(keys), cin, cout, dtype)

    stem = {"conv": {"kernel": conv(7, 3, 64)["kernel"]}, "norm": nn.init_norm(64, dtype)}
    stages = {}
    cin = 64
    for si, (nblk, mid, cout, stride) in enumerate(_RN_STAGES):
        blocks = {}
        for bi in range(nblk):
            b = {
                "conv1": {"kernel": conv(1, cin if bi == 0 else cout, mid)["kernel"]},
                "norm1": nn.init_norm(mid, dtype),
                "conv2": {"kernel": conv(3, mid, mid)["kernel"]},
                "norm2": nn.init_norm(mid, dtype),
                "conv3": {"kernel": conv(1, mid, cout)["kernel"]},
                "norm3": nn.init_norm(cout, dtype),
            }
            if bi == 0:
                b["downsample"] = {"conv": {"kernel": conv(1, cin, cout)["kernel"]},
                                   "norm": nn.init_norm(cout, dtype)}
            blocks[str(bi)] = b
        stages[str(si)] = {"blocks": blocks}
        cin = cout

    vit_blocks = {}
    for i in range(_VIT_DEPTH):
        vit_blocks[str(i)] = {
            "norm1": nn.init_norm(_VIT_DIM, dtype),
            "attn": {"qkv": lin(_VIT_DIM, 3 * _VIT_DIM),
                     "proj": lin(_VIT_DIM, _VIT_DIM)},
            "norm2": nn.init_norm(_VIT_DIM, dtype),
            "mlp": {"fc1": lin(_VIT_DIM, 4 * _VIT_DIM),
                    "fc2": lin(4 * _VIT_DIM, _VIT_DIM)},
        }

    def postprocess(cout, extra=False):
        p = {"0": {"project": {"0": lin(2 * _VIT_DIM, _VIT_DIM)}},
             "3": conv(1, _VIT_DIM, cout)}
        if extra:
            p["4"] = conv(3, cout, cout)
        return p

    def rcu():
        return {"conv1": conv(3, _FEATURES, _FEATURES),
                "conv2": conv(3, _FEATURES, _FEATURES)}

    def fusion():
        return {"out_conv": conv(1, _FEATURES, _FEATURES),
                "resConfUnit1": rcu(), "resConfUnit2": rcu()}

    return {
        "pretrained": {
            "model": {
                "patch_embed": {"backbone": {"stem": stem, "stages": stages},
                                "proj": conv(1, 1024, _VIT_DIM)},
                "cls_token": jnp.zeros((1, 1, _VIT_DIM), dtype),
                "pos_embed": jax.random.normal(next(keys), (1, 577, _VIT_DIM), dtype) * 0.02,
                "blocks": vit_blocks,
            },
            "act_postprocess3": postprocess(768),
            "act_postprocess4": postprocess(768, extra=True),
        },
        "scratch": {
            "layer1_rn": {"kernel": conv(3, 256, _FEATURES)["kernel"]},
            "layer2_rn": {"kernel": conv(3, 512, _FEATURES)["kernel"]},
            "layer3_rn": {"kernel": conv(3, 768, _FEATURES)["kernel"]},
            "layer4_rn": {"kernel": conv(3, 768, _FEATURES)["kernel"]},
            "refinenet1": fusion(), "refinenet2": fusion(),
            "refinenet3": fusion(), "refinenet4": fusion(),
            "output_conv": {"0": conv(3, _FEATURES, _FEATURES // 2),
                            "2": conv(3, _FEATURES // 2, 32),
                            "4": conv(1, 32, 1)},
        },
    }


_params = None


def get_params():
    global _params
    if _params is None:
        _params = load_torch_params(
            pretrained_path("midas", "dpt_hybrid-midas-501f0c75.pt"),
            torch_sd_to_pytree)
    return _params


def apply_midas(image01: np.ndarray, params=None, a=np.pi * 2.0, bg_th=0.1):
    """image01: (H, W, 3) [0,1]. Returns (depth uint8 (H,W), normal uint8
    (H,W,3) BGR-flipped) — reference midas/__init__.py:15-46."""
    from pfd_tpu.annotators.imageops import sobel

    params = params if params is not None else get_params()
    h, w = image01.shape[:2]
    pad_h = (32 - h % 32) % 32
    pad_w = (32 - w % 32) % 32
    x = np.asarray(image01, np.float32) * 255.0 / 127.5 - 1.0
    if pad_h or pad_w:
        x = np.pad(x, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    depth = np.asarray(dpt_hybrid_forward(params, jnp.asarray(x)[None]))[0]
    depth = depth[:h, :w]

    depth_pt = depth - depth.min()
    depth_pt = depth_pt / max(depth_pt.max(), 1e-8)
    depth_image = (depth_pt * 255.0).clip(0, 255).astype(np.uint8)

    gx, gy = sobel(depth)
    z = np.ones_like(gx) * a
    gx[depth_pt < bg_th] = 0
    gy[depth_pt < bg_th] = 0
    normal = np.stack([gx, gy, z], axis=2)
    normal /= np.sum(normal ** 2.0, axis=2, keepdims=True) ** 0.5
    normal_image = (normal * 127.5 + 127.5).clip(0, 255).astype(np.uint8)[:, :, ::-1]
    return depth_image, normal_image
