"""CLIP (ViT + text transformer) as pure JAX functions over param pytrees.

TPU-native re-architecture of the reference's vendored CLIP
(reference: CLIP/clip/model_explainability.py). Key departures:

- No modules/hooks: the model is ``init`` + pure ``apply`` functions over a
  nested-dict pytree. Per-block parameters are STACKED along a leading layer
  axis and the transformer runs as ``lax.scan``, so the 12-block ViT traces
  once regardless of depth.
- Attention probabilities are first-class outputs: ``vit_forward`` returns
  the per-layer softmax probs, and accepts an additive perturbation
  ``attn_eps`` on selected layers. Gradients w.r.t. that perturbation ARE
  the gradients w.r.t. the attention probs (the quantity the Chefer
  relevancy needs), replacing torch's forward-hook + autograd.grad machinery
  (reference: auxiliary.py:329-335, clip_gradcam.py:90-97) with one
  differentiable jitted function.
- Patch embedding is a patchify + matmul (MXU) instead of a conv.
- LayerNorm always computes in fp32 (reference casts to fp32 in LayerNorm,
  model_explainability.py:188-194); everything else runs in a configurable
  ``compute_dtype`` (bf16 on TPU).

Weight layout matches OpenAI ViT-B/32 checkpoints via ``convert.py``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    # "vit" or "resnet" (the ModifiedResNet tower, clip/resnet.py);
    # resnet_layers holds the per-stage bottleneck counts (RN50: 3,4,6,3)
    vision_arch: str = "vit"
    resnet_layers: Tuple[int, ...] = ()

    @property
    def vision_heads(self) -> int:
        if self.vision_arch == "resnet":
            # attnpool embed dim = width * 32 (reference :160-163)
            return self.vision_width * 32 // 64
        return self.vision_width // 64

    @property
    def vision_tokens(self) -> int:
        return (self.image_resolution // self.vision_patch_size) ** 2 + 1


VIT_B_32 = ClipConfig()


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5):
    """LayerNorm computed in fp32 regardless of activation dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _attention(
    block: dict,
    x: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array],
    attn_eps: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Multi-head self-attention returning (out, probs).

    x: (B, T, W). block holds w_qkv (W, 3W), b_qkv (3W,), w_out (W, W),
    b_out (W,). ``attn_eps`` (B, H, T, T) is added to the softmax probs
    before the value contraction; zeros leave the forward unchanged while
    exposing d(out)/d(probs) to autodiff.
    """
    b, t, w = x.shape
    head_dim = w // num_heads
    qkv = x @ block["w_qkv"].astype(x.dtype) + block["b_qkv"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def to_heads(a):
        return a.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = to_heads(q) * (head_dim**-0.5), to_heads(k), to_heads(v)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    if attn_eps is not None:
        probs = probs + attn_eps.astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, w)
    out = out @ block["w_out"].astype(x.dtype) + block["b_out"].astype(x.dtype)
    return out, probs


def _attention_fast(block: dict, x: jax.Array, num_heads: int) -> jax.Array:
    """MHA without attention-prob outputs: fused Pallas kernel on TPU
    (ops/pallas_kernels.fused_mha, -25% on the ViT fwd scan), XLA fallback
    elsewhere. Only valid when no mask/eps and probs aren't consumed."""
    from ..ops.pallas_kernels import fused_mha

    qkv = x @ block["w_qkv"].astype(x.dtype) + block["b_qkv"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = fused_mha(q, k, v, num_heads)
    return out @ block["w_out"].astype(x.dtype) + block["b_out"].astype(x.dtype)


def _block_forward(block, x, num_heads, mask=None, attn_eps=None, need_probs=True):
    """Pre-LN residual attention block (reference model_explainability.py:252-255).

    With ``need_probs=False`` (and no mask/eps) attention runs through the
    fused no-probs kernel and the returned probs are None.
    """
    xn = layer_norm(x, block["ln_1"]["scale"], block["ln_1"]["bias"])
    if not need_probs and mask is None and attn_eps is None:
        attn_out, probs = _attention_fast(block, xn, num_heads), None
    else:
        attn_out, probs = _attention(block, xn, num_heads, mask, attn_eps)
    x = x + attn_out
    h = layer_norm(x, block["ln_2"]["scale"], block["ln_2"]["bias"])
    h = quick_gelu(h @ block["w_fc"].astype(x.dtype) + block["b_fc"].astype(x.dtype))
    h = h @ block["w_proj"].astype(x.dtype) + block["b_proj"].astype(x.dtype)
    return x + h, probs


def transformer_forward(
    blocks: dict,
    x: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    attn_eps: Optional[jax.Array] = None,
    need_probs: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scan over stacked block params. Returns (out, probs (L, B, H, T, T));
    probs is None when ``need_probs=False`` (fused no-probs attention)."""

    if not need_probs and mask is None and attn_eps is None:
        def body_fast(carry, block):
            out, _ = _block_forward(block, carry, num_heads, need_probs=False)
            return out, None

        out, _ = jax.lax.scan(body_fast, x, blocks)
        return out, None

    def body(carry, layer_in):
        block, eps = layer_in
        out, probs = _block_forward(block, carry, num_heads, mask, eps)
        return out, probs

    if attn_eps is None:
        L = blocks["w_qkv"].shape[0]
        b, t, _ = x.shape
        attn_eps = jnp.zeros((L, b, num_heads, t, t), dtype=x.dtype)
    out, probs = jax.lax.scan(body, x, (blocks, attn_eps))
    return out, probs


def interpolate_positional_emb(pos_emb: jax.Array, target_len: int) -> jax.Array:
    """Linear interpolation of positional embeddings to ``target_len`` tokens.

    Matches reference auxiliary.py:24-38 (anchored to the 50-token grid).
    """
    src_len = pos_emb.shape[0]
    i3 = np.arange(target_len) / (target_len / 50.0)
    i1 = np.floor(i3).astype(int)
    i2 = np.ceil(i3).astype(int)
    frac = jnp.asarray(i3 - i1, dtype=pos_emb.dtype)[:, None]
    in_range = i2 < src_len
    i1c = np.clip(i1, 0, src_len - 1)
    i2c = np.clip(i2, 0, src_len - 1)
    lerped = pos_emb[i1c] * (1 - frac) + pos_emb[i2c] * frac
    return jnp.where(jnp.asarray(in_range)[:, None], lerped, pos_emb[-1])


def patchify(pixels: jax.Array, patch_size: int) -> jax.Array:
    """(B, 3, H, W) -> (B, H/p * W/p, 3*p*p) non-overlapping patches.

    Flattening order matches torch Conv2d weight layout (C, kh, kw).
    """
    b, c, h, w = pixels.shape
    gh, gw = h // patch_size, w // patch_size
    x = pixels.reshape(b, c, gh, patch_size, gw, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, gh, gw, C, p, p)
    return x.reshape(b, gh * gw, c * patch_size * patch_size)


def vit_forward(
    visual: dict,
    pixels: jax.Array,
    cfg: ClipConfig,
    compute_dtype=jnp.float32,
    attn_eps: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    need_probs: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """ViT image encoder. pixels (B, 3, H, W) -> (features (B, E), probs).

    probs is (L, B, H, T, T): every layer's attention probabilities, the
    residuals the relevancy engine differentiates against. ``attn_mask``
    is an additive (T, T) mask applied in every block — the reference's
    per-tile attention-mask override (CLIP/clip/model.py:250-273,
    encode_image(**kwargs) :446).
    """
    x = patchify(pixels.astype(compute_dtype), cfg.vision_patch_size)
    x = x @ visual["patch_embed"].astype(compute_dtype)
    b, n, w = x.shape
    cls = jnp.broadcast_to(
        visual["class_embedding"].astype(compute_dtype), (b, 1, w)
    )
    x = jnp.concatenate([cls, x], axis=1)
    pos = visual["pos_embed"]
    # reference quirk: interpolation triggers whenever the token count is not
    # 50 (ViT-B/32 at 224^2), anchored to the 50-token grid — even when the
    # positional embedding already has the right length
    # (model_explainability.py:339-343)
    if x.shape[1] != 50:
        pos = interpolate_positional_emb(pos, x.shape[1])
    x = x + pos.astype(compute_dtype)
    x = layer_norm(x, visual["ln_pre"]["scale"], visual["ln_pre"]["bias"])
    x, probs = transformer_forward(
        visual["blocks"], x, cfg.vision_heads, mask=attn_mask, attn_eps=attn_eps,
        need_probs=need_probs,
    )
    x = layer_norm(x[:, 0, :], visual["ln_post"]["scale"], visual["ln_post"]["bias"])
    feats = x @ visual["proj"].astype(compute_dtype)
    return feats, probs


def causal_mask(t: int) -> jax.Array:
    return jnp.triu(jnp.full((t, t), -jnp.inf, dtype=jnp.float32), k=1)


def encode_text(
    text_params: dict,
    tokens: jax.Array,
    cfg: ClipConfig,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Text encoder: (B, 77) int tokens -> (B, E) features.

    EOT pooling by argmax token id (reference model_explainability.py:469-482).
    """
    x = text_params["token_embedding"][tokens].astype(compute_dtype)
    x = x + text_params["pos_embed"].astype(compute_dtype)
    x, _ = transformer_forward(
        text_params["blocks"], x, cfg.text_heads, mask=causal_mask(tokens.shape[1])
    )
    x = layer_norm(x, text_params["ln_final"]["scale"], text_params["ln_final"]["bias"])
    eot = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return pooled @ text_params["projection"].astype(compute_dtype)


def encode_image(params: dict, pixels: jax.Array, cfg: ClipConfig,
                 compute_dtype=jnp.float32, tile_attn_mask=None):
    if cfg.vision_arch == "resnet":
        if tile_attn_mask is not None:
            raise ValueError(
                "tile_attn_mask is transformer-only (reference "
                "CLIP/clip/model.py:250-273 patches the Transformer tower)"
            )
        from .resnet import modified_resnet_forward

        return modified_resnet_forward(
            params["visual"], pixels, cfg.vision_heads, compute_dtype
        )
    feats, _ = vit_forward(
        params["visual"], pixels, cfg, compute_dtype, attn_mask=tile_attn_mask,
        need_probs=False,
    )
    return feats


def _init_blocks(rs, layers, width, scale_attn, scale_proj, scale_fc):
    def normal(shape, scale):
        return jnp.asarray(rs.randn(*shape).astype(np.float32) * scale)

    return {
        "ln_1": {"scale": jnp.ones((layers, width)), "bias": jnp.zeros((layers, width))},
        "ln_2": {"scale": jnp.ones((layers, width)), "bias": jnp.zeros((layers, width))},
        "w_qkv": normal((layers, width, 3 * width), scale_attn),
        "b_qkv": jnp.zeros((layers, 3 * width)),
        "w_out": normal((layers, width, width), scale_proj),
        "b_out": jnp.zeros((layers, width)),
        "w_fc": normal((layers, width, 4 * width), scale_fc),
        "b_fc": jnp.zeros((layers, 4 * width)),
        "w_proj": normal((layers, 4 * width, width), scale_proj),
        "b_proj": jnp.zeros((layers, width)),
    }


def init_clip_params(key: jax.Array, cfg: ClipConfig = VIT_B_32) -> dict:
    """Random init mirroring reference scales (model_explainability.py:418-452).

    Draws on the HOST with numpy (seeded from ``key``): on TPU,
    device-side random init compiles one kernel per tensor (~15 remote
    compiles, minutes of wall clock) for weights that are random anyway.
    """
    seed = int(np.asarray(jax.random.key_data(key)).reshape(-1)[-1]) % (2**31)
    rs = np.random.RandomState(seed)
    vw, tw = cfg.vision_width, cfg.text_width
    vscale = vw**-0.5

    def normal(shape, scale):
        return jnp.asarray(rs.randn(*shape).astype(np.float32) * scale)

    visual = {
        "patch_embed": normal((3 * cfg.vision_patch_size**2, vw), vscale),
        "class_embedding": normal((vw,), vscale),
        "pos_embed": normal((cfg.vision_tokens, vw), vscale),
        "ln_pre": {"scale": jnp.ones((vw,)), "bias": jnp.zeros((vw,))},
        "ln_post": {"scale": jnp.ones((vw,)), "bias": jnp.zeros((vw,))},
        "blocks": _init_blocks(
            rs, cfg.vision_layers, vw, vw**-0.5,
            (vw**-0.5) * ((2 * cfg.vision_layers) ** -0.5), (2 * vw) ** -0.5,
        ),
        "proj": normal((vw, cfg.embed_dim), vscale),
    }
    text = {
        "token_embedding": normal((cfg.vocab_size, tw), 0.02),
        "pos_embed": normal((cfg.context_length, tw), 0.01),
        "blocks": _init_blocks(
            rs, cfg.text_layers, tw, tw**-0.5,
            (tw**-0.5) * ((2 * cfg.text_layers) ** -0.5), (2 * tw) ** -0.5,
        ),
        "ln_final": {"scale": jnp.ones((tw,)), "bias": jnp.zeros((tw,))},
        "projection": normal((tw, cfg.embed_dim), tw**-0.5),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype=jnp.float32),
    }
