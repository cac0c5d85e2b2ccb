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
    quick_gelu,
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
    # no-probs fast scan: fused Pallas MHA on TPU (-25% on this scan, the
    # dominant compute of the single-tail gradcam path)
    x, _ = transformer_forward(head_blocks, x, cfg.vision_heads, need_probs=False)
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


def _gradcam_single_tail(
    visual: dict,
    tiles: jax.Array,
    zeroshot_weights: jax.Array,
    cfg: ClipConfig,
    num_layers: int,
    positive_attn_only: bool,
    compute_dtype,
) -> jax.Array:
    """Exact fast path for n_tail == 1 (ViT-B/32 at the paper's
    num_layers=10: blocks 11..11).

    With one tail block, R = I + mean_heads(relu(grad*attn)) and the
    output is R[:, 0, 1:]: ONLY the CLS row of d(logit)/d(attn_probs)
    matters — and within a single block, logits depend on probs row 0
    alone. So instead of a full vmapped VJP through the tail:

    - the tail block forward runs with the CLS query only (attention is
      (B, H, 1, T), not (B, H, T, T)),
    - d(logit_l)/d(attn_out_row0) is a (W,)-sized autodiff through the
      MLP/LN/proj chain per label (tiny),
    - d(logit_l)/d(probs[h, 0, k]) = <(g_a W_out^T)_h, v[h, k]> in closed
      form.

    Measured ~2x end-to-end on the saliency pipeline; numerically
    identical to the general path (tests).
    """
    n_head = num_layers + 1
    x_mid = _vit_head(visual, tiles, cfg, compute_dtype, n_head)
    x_mid = jax.lax.stop_gradient(x_mid)
    block = _tree_slice(visual["blocks"], n_head)
    b, t, w = x_mid.shape
    heads = cfg.vision_heads
    hd = w // heads

    ln1 = layer_norm(x_mid, block["ln_1"]["scale"], block["ln_1"]["bias"])
    qkv = ln1 @ block["w_qkv"].astype(ln1.dtype) + block["b_qkv"].astype(ln1.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q_cls = q[:, 0].reshape(b, heads, hd) * (hd**-0.5)
    k_h = k.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)  # (B, H, T, hd)
    v_h = v.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
    logits_cls = jnp.einsum(
        "bhd,bhkd->bhk", q_cls, k_h, preferred_element_type=jnp.float32
    )
    probs_cls = jax.nn.softmax(logits_cls, axis=-1)  # (B, H, T)
    s = jnp.einsum("bhk,bhkd->bhd", probs_cls.astype(v_h.dtype), v_h)
    attn_row0 = s.reshape(b, w) @ block["w_out"].astype(s.dtype) + block[
        "b_out"
    ].astype(s.dtype)

    def logit_from_attn0(a0, t_vec):
        x2_0 = x_mid[:, 0] + a0
        h2 = layer_norm(x2_0, block["ln_2"]["scale"], block["ln_2"]["bias"])
        m = quick_gelu(h2 @ block["w_fc"].astype(h2.dtype)
                       + block["b_fc"].astype(h2.dtype))
        m = m @ block["w_proj"].astype(h2.dtype) + block["b_proj"].astype(h2.dtype)
        x3_0 = x2_0 + m
        f = layer_norm(x3_0, visual["ln_post"]["scale"], visual["ln_post"]["bias"])
        f = f @ visual["proj"].astype(f.dtype)
        f32 = f.astype(jnp.float32)
        f32 = f32 / jnp.linalg.norm(f32, axis=-1, keepdims=True)
        return (100.0 * f32 @ t_vec.astype(jnp.float32)).sum()

    def grad_attn0_for_label(t_vec):
        return jax.grad(logit_from_attn0)(attn_row0, t_vec)  # (B, W)

    g_a = jax.vmap(grad_attn0_for_label)(
        zeroshot_weights.T.astype(jnp.float32)
    )  # (L, B, W)
    ga_heads = (
        g_a.astype(jnp.float32) @ block["w_out"].astype(jnp.float32).T
    ).reshape(-1, b, heads, hd)
    grad_probs0 = jnp.einsum(
        "lbhd,bhkd->lbhk", ga_heads, v_h.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (L, B, H, T)

    cam = grad_probs0 * probs_cls[None].astype(jnp.float32)
    if positive_attn_only:
        cam = jnp.maximum(cam, 0.0)
    relevance = cam.mean(axis=2)[..., 1:]  # mean heads, drop CLS column
    g = int(round((t - 1) ** 0.5))
    return relevance.reshape(zeroshot_weights.shape[1], b, g, g)


def gradcam(
    visual: dict,
    tiles: jax.Array,
    zeroshot_weights: jax.Array,
    cfg: ClipConfig,
    num_layers: int = 10,
    positive_attn_only: bool = True,
    compute_dtype=jnp.float32,
    force_general: bool = False,
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
    if n_tail == 1 and not force_general:
        # single tail block (ViT-B/32 paper config): exact closed-form
        # CLS-row gradient, no backward pass — see _gradcam_single_tail
        return _gradcam_single_tail(
            visual, tiles, zeroshot_weights, cfg, num_layers,
            positive_attn_only, compute_dtype,
        )
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
