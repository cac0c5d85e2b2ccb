"""Chefer-style attention-gradient relevancy as one jitted forward+VJP.

TPU-native re-architecture of the reference's ClipGradcam
(reference: CLIP/clip/clip_gradcam.py:30-143). The reference loops over
labels calling ``torch.autograd.grad(logit, block.attn_probs)`` against
forward-hook state (clip_gradcam.py:90-97); here the whole computation is a
single differentiable function:

- The ViT forward is split at ``num_layers`` (reference default 10): the
  head (blocks 0..num_layers) runs once with no gradient bookkeeping; the
  tail blocks expose their attention probabilities through an additive
  zero-valued perturbation ``eps`` so that ``d(logit)/d(eps) ==
  d(logit)/d(attn_probs)``. The VJP therefore backpropagates only through
  the tail — for ViT-B/32 that is exactly one block (12 blocks, indices
  11..11 satisfy i > 10), which is why the reference's relevancy reduces to
  ``R = I + mean_heads(relu(grad * attn))`` of the last block.
- Per-label gradients are a ``vmap`` of the VJP over the label axis (each
  label's logit is an independent linear readout of the normalized image
  features), replacing the reference's serial Python loop.
- The cam accumulation R <- R + mean_heads(relu(grad*attn)) @ R runs over
  the (statically unrolled) tail blocks in order.

Output matches clip_gradcam.interpret: (num_labels, num_tiles, g, g) with
g = sqrt(tokens-1), the CLS-row relevancy over image patches.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .model import (
    ClipConfig,
    _block_forward,
    layer_norm,
    patchify,
    interpolate_positional_emb,
    transformer_forward,
)


def _tree_slice(tree, sl):
    return jax.tree_util.tree_map(lambda a: a[sl], tree)


def _vit_head(visual: dict, pixels: jax.Array, cfg: ClipConfig, compute_dtype, n_head_blocks: int):
    """Patch embed + blocks [0, n_head_blocks) — no relevancy bookkeeping."""
    x = patchify(pixels.astype(compute_dtype), cfg.vision_patch_size)
    x = x @ visual["patch_embed"].astype(compute_dtype)
    b, n, w = x.shape
    cls = jnp.broadcast_to(visual["class_embedding"].astype(compute_dtype), (b, 1, w))
    x = jnp.concatenate([cls, x], axis=1)
    pos = visual["pos_embed"]
    if x.shape[1] != 50:  # reference quirk, see model.vit_forward
        pos = interpolate_positional_emb(pos, x.shape[1])
    x = x + pos.astype(compute_dtype)
    x = layer_norm(x, visual["ln_pre"]["scale"], visual["ln_pre"]["bias"])
    head_blocks = _tree_slice(visual["blocks"], slice(0, n_head_blocks))
    x, _ = transformer_forward(head_blocks, x, cfg.vision_heads)
    return x


def _vit_tail(visual: dict, x: jax.Array, cfg: ClipConfig, compute_dtype, n_head_blocks: int, eps):
    """Blocks [n_head_blocks, L) with attention-prob perturbations ``eps``.

    eps: tuple of (B, H, T, T), one per tail block. Returns (normalized
    image features (B, E), per-tail-block attention probs).
    """
    probs_all = []
    for j in range(cfg.vision_layers - n_head_blocks):
        block = _tree_slice(visual["blocks"], n_head_blocks + j)
        x, probs = _block_forward(block, x, cfg.vision_heads, mask=None, attn_eps=eps[j])
        probs_all.append(probs)
    feats = layer_norm(x[:, 0, :], visual["ln_post"]["scale"], visual["ln_post"]["bias"])
    feats = feats @ visual["proj"].astype(compute_dtype)
    norm = jnp.linalg.norm(feats.astype(jnp.float32), axis=-1, keepdims=True)
    feats = (feats.astype(jnp.float32) / norm)
    return feats, tuple(probs_all)


def gradcam(
    visual: dict,
    tiles: jax.Array,
    zeroshot_weights: jax.Array,
    cfg: ClipConfig,
    num_layers: int = 10,
    positive_attn_only: bool = True,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Relevancy maps for a batch of tiles against a batch of labels.

    tiles: (B, 3, R, R) preprocessed pixels. zeroshot_weights: (E, L) mean
    prompt-ensemble text features (reference clip_gradcam.py:12-27).
    Returns (L, B, g, g) float32 relevancy, g = grid side.

    ``num_layers`` reproduces the reference cutoff: only blocks with index
    > num_layers contribute cams (clip_gradcam.py:85-86).
    """
    n_head = num_layers + 1
    n_tail = cfg.vision_layers - n_head
    if n_tail < 1:
        raise ValueError("num_layers leaves no tail blocks to interpret")
    b = tiles.shape[0]
    h_heads = cfg.vision_heads
    t = cfg.vision_tokens

    x_mid = _vit_head(visual, tiles, cfg, compute_dtype, n_head)
    x_mid = jax.lax.stop_gradient(x_mid)

    eps0 = tuple(
        jnp.zeros((b, h_heads, t, t), dtype=compute_dtype) for _ in range(n_tail)
    )
    (feats, probs), vjp_fn = jax.vjp(
        lambda e: _vit_tail(visual, x_mid, cfg, compute_dtype, n_head, e), eps0
    )

    zero_probs = tuple(jnp.zeros_like(p) for p in probs)

    def grads_for_label(t_vec):
        cot = jnp.broadcast_to(100.0 * t_vec, feats.shape).astype(feats.dtype)
        (d_eps,) = vjp_fn((cot, zero_probs))
        return d_eps

    grads = jax.vmap(grads_for_label)(zeroshot_weights.T.astype(jnp.float32))
    # grads: tuple over tail blocks of (L, B, H, T, T)

    num_labels = zeroshot_weights.shape[1]
    eye = jnp.eye(t, dtype=jnp.float32)
    r_mat = jnp.broadcast_to(eye, (num_labels, b, t, t))
    # A fused relu(grad*attn)-mean-heads-matmul-accumulate Pallas kernel
    # exists (ops/pallas_kernels.chefer_cam_accumulate) but measured 5.4x
    # SLOWER than this XLA path on v5e (8.9 vs 1.7 ms per step: 288 tiny
    # (50, 50) programs occupy the chip poorly while XLA fuses the cam
    # intermediate away on its own) — so XLA stays the default.
    use_pallas = False
    for j in range(n_tail):
        if use_pallas and positive_attn_only:
            from ..ops.pallas_kernels import chefer_cam_accumulate

            attn_b = jnp.broadcast_to(
                probs[j][None].astype(jnp.float32), grads[j].shape
            )
            r_mat = chefer_cam_accumulate(grads[j], attn_b, r_mat)
            continue
        cam = grads[j].astype(jnp.float32) * probs[j][None].astype(jnp.float32)
        if positive_attn_only:
            cam = jnp.maximum(cam, 0.0)
        cam = cam.mean(axis=2)  # mean over heads -> (L, B, T, T)
        r_mat = r_mat + jnp.einsum(
            "lbij,lbjk->lbik", cam, r_mat, preferred_element_type=jnp.float32
        )
    relevance = r_mat[:, :, 0, 1:]
    g = int(round((t - 1) ** 0.5))
    return relevance.reshape(num_labels, b, g, g)


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_layers", "positive_attn_only", "compute_dtype")
)
def gradcam_jit(visual, tiles, zeroshot_weights, cfg, num_layers=10,
                positive_attn_only=True, compute_dtype=jnp.float32):
    return gradcam(
        visual, tiles, zeroshot_weights, cfg, num_layers, positive_attn_only, compute_dtype
    )


def zeroshot_weights_from_features(class_template_features: jax.Array) -> jax.Array:
    """(L, P, E) per-class per-template text features -> (E, L) weights.

    Normalizes each template embedding then averages over templates WITHOUT
    renormalizing, matching reference zeroshot_classifier
    (clip_gradcam.py:12-27).
    """
    feats = class_template_features.astype(jnp.float32)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats.mean(axis=1).T
