"""ModifiedResNet CLIP visual encoder, pure JAX (NHWC, MXU convs).

TPU-native re-architecture of the reference's ResNet CLIP variant
(reference: CLIP/clip/model_explainability.py:17-185 — Bottleneck :17-67,
AttentionPool2d :71-117, ModifiedResNet :120-185). The paper's pipeline
uses ViT-B/32 (generate_relevancy.py:168) and the Chefer relevancy is
transformer-only, but the reference ships RN50-style checkp:loading for
text features / `get_visual_feature`; this module completes that surface.

Departures from the torch classes:
- NHWC activations + HWIO weights (TPU conv layout); one NCHW->NHWC
  transpose at the input.
- BatchNorm buffers are stored raw for checkpoint fidelity and folded to
  (scale, bias) inside the jitted apply (inference semantics — the
  reference only ever evals this tower).
- AttentionPool computes the CLS query only: torch's
  multi_head_attention_forward attends from every token and then keeps
  row 0 (:117); attending from row 0 alone is value-identical and 50x
  cheaper.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bn(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    scale = (p["weight"] / jnp.sqrt(p["running_var"] + eps)).astype(x.dtype)
    bias = (p["bias"] - p["running_mean"] * p["weight"]
            / jnp.sqrt(p["running_var"] + eps)).astype(x.dtype)
    return x * scale + bias


def _conv(x: jax.Array, w: jax.Array, stride: int = 1, pad: int = 0) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _avg_pool(x: jax.Array, k: int) -> jax.Array:
    if k <= 1:
        return x
    s = jax.lax.reduce_window(
        x, jnp.asarray(0.0, x.dtype), jax.lax.add,
        (1, k, k, 1), (1, k, k, 1), "VALID",
    )
    return s / (k * k)


def _bottleneck(p: dict, x: jax.Array, stride: int) -> jax.Array:
    """Anti-aliased bottleneck (reference :17-67): all convs stride 1, an
    avgpool after conv2 when stride > 1; downsample = avgpool + 1x1 conv."""
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], pad=1), p["bn2"]))
    out = _avg_pool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample_conv" in p:
        identity = _bn(
            _conv(_avg_pool(x, stride), p["downsample_conv"]), p["downsample_bn"]
        )
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attention_pool(p: dict, x: jax.Array, num_heads: int) -> jax.Array:
    """QKV attention pool (reference AttentionPool2d :71-117). x NHWC."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    mean = tokens.mean(axis=1, keepdims=True)
    t = jnp.concatenate([mean, tokens], axis=1)
    t = t + p["pos_embed"].astype(t.dtype)[None]
    head_dim = c // num_heads

    q = (t[:, :1] @ p["q_w"].astype(t.dtype) + p["q_b"].astype(t.dtype))
    k = t @ p["k_w"].astype(t.dtype) + p["k_b"].astype(t.dtype)
    v = t @ p["v_w"].astype(t.dtype) + p["v_b"].astype(t.dtype)
    q = q.reshape(b, 1, num_heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, num_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, num_heads, head_dim).transpose(0, 2, 1, 3)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (head_dim**-0.5), k,
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(t.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, c)
    return out @ p["c_w"].astype(t.dtype) + p["c_b"].astype(t.dtype)


def modified_resnet_forward(
    visual: dict,
    pixels: jax.Array,
    num_heads: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """(B, 3, H, W) -> (B, output_dim). Reference ModifiedResNet.forward
    (:167-185): 3-conv stem + avgpool, 4 bottleneck stages, attention pool."""
    x = pixels.astype(compute_dtype).transpose(0, 2, 3, 1)  # NHWC
    x = jax.nn.relu(_bn(_conv(x, visual["stem"]["conv1"], stride=2, pad=1),
                        visual["stem"]["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, visual["stem"]["conv2"], pad=1),
                        visual["stem"]["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, visual["stem"]["conv3"], pad=1),
                        visual["stem"]["bn3"]))
    x = _avg_pool(x, 2)
    for si, stage in enumerate(visual["layers"]):
        stride = 1 if si == 0 else 2
        for bi, block in enumerate(stage):
            x = _bottleneck(block, x, stride if bi == 0 else 1)
    return _attention_pool(visual["attnpool"], x, num_heads)


# ---------------------------------------------------------------------------
# torch state-dict conversion (reference layout, model_explainability.py)
# ---------------------------------------------------------------------------


def _np32(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _conv_w(sd, key) -> np.ndarray:
    # torch OIHW -> HWIO
    return _np32(sd[key]).transpose(2, 3, 1, 0)


def _bn_params(sd, prefix) -> dict:
    return {
        "weight": _np32(sd[prefix + ".weight"]),
        "bias": _np32(sd[prefix + ".bias"]),
        "running_mean": _np32(sd[prefix + ".running_mean"]),
        "running_var": _np32(sd[prefix + ".running_var"]),
    }


def resnet_config_from_state_dict(sd: dict, prefix: str = "visual.") -> dict:
    """Derive the ModifiedResNet config from state-dict keys/shapes only
    (reference build_model :549-557) — no weight conversion, so callers
    that only need the config (clip.convert.config_from_state_dict) skip
    the ~100 MB transpose pass."""
    counts = []
    for stage in range(1, 5):
        blocks = {
            int(k[len(prefix):].split(".")[1])
            for k in sd
            if k.startswith(f"{prefix}layer{stage}.")
        }
        counts.append(len(blocks))
    width = _np32(sd[f"{prefix}layer1.0.conv1.weight"]).shape[0]
    output_dim = _np32(sd[f"{prefix}attnpool.c_proj.weight"]).shape[0]
    embed_dim = width * 32
    spacial = int(
        round((_np32(sd[f"{prefix}attnpool.positional_embedding"]).shape[0] - 1)
              ** 0.5)
    )
    return {
        "layers": tuple(counts),
        "width": width,
        "output_dim": output_dim,
        "heads": embed_dim // 64,
        "input_resolution": spacial * 32,
    }


def convert_resnet_visual(sd: dict, prefix: str = "visual.") -> Tuple[dict, dict]:
    """torch ModifiedResNet state dict -> (visual pytree, derived config)."""
    cfg = resnet_config_from_state_dict(sd, prefix)
    counts = cfg["layers"]
    stem = {
        "conv1": _conv_w(sd, f"{prefix}conv1.weight"),
        "bn1": _bn_params(sd, f"{prefix}bn1"),
        "conv2": _conv_w(sd, f"{prefix}conv2.weight"),
        "bn2": _bn_params(sd, f"{prefix}bn2"),
        "conv3": _conv_w(sd, f"{prefix}conv3.weight"),
        "bn3": _bn_params(sd, f"{prefix}bn3"),
    }
    layers = []
    for stage in range(1, 5):
        blocks = []
        for bi in range(counts[stage - 1]):
            base = f"{prefix}layer{stage}.{bi}"
            block = {
                "conv1": _conv_w(sd, f"{base}.conv1.weight"),
                "bn1": _bn_params(sd, f"{base}.bn1"),
                "conv2": _conv_w(sd, f"{base}.conv2.weight"),
                "bn2": _bn_params(sd, f"{base}.bn2"),
                "conv3": _conv_w(sd, f"{base}.conv3.weight"),
                "bn3": _bn_params(sd, f"{base}.bn3"),
            }
            if f"{base}.downsample.0.weight" in sd:
                block["downsample_conv"] = _conv_w(
                    sd, f"{base}.downsample.0.weight"
                )
                block["downsample_bn"] = _bn_params(sd, f"{base}.downsample.1")
            blocks.append(block)
        layers.append(blocks)
    ap = f"{prefix}attnpool."
    attnpool = {
        "pos_embed": _np32(sd[ap + "positional_embedding"]),
        "q_w": _np32(sd[ap + "q_proj.weight"]).T,
        "q_b": _np32(sd[ap + "q_proj.bias"]),
        "k_w": _np32(sd[ap + "k_proj.weight"]).T,
        "k_b": _np32(sd[ap + "k_proj.bias"]),
        "v_w": _np32(sd[ap + "v_proj.weight"]).T,
        "v_b": _np32(sd[ap + "v_proj.bias"]),
        "c_w": _np32(sd[ap + "c_proj.weight"]).T,
        "c_b": _np32(sd[ap + "c_proj.bias"]),
    }
    return {"stem": stem, "layers": layers, "attnpool": attnpool}, cfg
