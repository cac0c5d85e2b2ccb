"""OpenAI CLIP torch state_dict -> JAX param pytree converter.

Offline conversion utility (torch is a dev-only dependency used to read
``.pt`` checkpoints; the runtime never imports it). Accepts either a mapping
of numpy arrays or torch tensors keyed by the reference's module names
(reference: CLIP/clip/model_explainability.py:530-602 ``build_model`` infers
the same architecture hyperparameters from these keys).

Layout transforms:
- ``visual.conv1.weight`` (W, 3, p, p) -> ``patch_embed`` (3*p*p, W): the
  patchify+matmul embedding flattens each patch in (C, kh, kw) order, so the
  conv kernel is just reshaped + transposed.
- per-block tensors are STACKED along a leading layer axis, and all
  ``nn.Linear`` weights (out, in) are transposed to (in, out) for
  right-multiplication.
- fp16 checkpoint tensors are upcast to fp32 (params are kept fp32; compute
  dtype is chosen at apply time).
"""
from __future__ import annotations

import numpy as np

from .model import ClipConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def config_from_state_dict(sd) -> ClipConfig:
    if "visual.layer1.0.conv1.weight" in sd:  # ModifiedResNet tower
        from .resnet import resnet_config_from_state_dict

        vcfg = resnet_config_from_state_dict(sd)
        text_width = _np(sd["ln_final.weight"]).shape[0]
        return ClipConfig(
            embed_dim=_np(sd["text_projection"]).shape[1],
            image_resolution=vcfg["input_resolution"],
            vision_layers=sum(vcfg["layers"]),
            vision_width=vcfg["width"],
            vision_patch_size=32,  # total downsampling factor
            context_length=_np(sd["positional_embedding"]).shape[0],
            vocab_size=_np(sd["token_embedding.weight"]).shape[0],
            text_width=text_width,
            text_heads=text_width // 64,
            text_layers=len(
                {k.split(".")[2] for k in sd
                 if k.startswith("transformer.resblocks.")}
            ),
            vision_arch="resnet",
            resnet_layers=vcfg["layers"],
        )
    vision_width = _np(sd["visual.conv1.weight"]).shape[0]
    vision_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
    )
    patch = _np(sd["visual.conv1.weight"]).shape[-1]
    grid = round((_np(sd["visual.positional_embedding"]).shape[0] - 1) ** 0.5)
    embed_dim = _np(sd["text_projection"]).shape[1]
    text_width = _np(sd["ln_final.weight"]).shape[0]
    return ClipConfig(
        embed_dim=embed_dim,
        image_resolution=patch * grid,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=_np(sd["positional_embedding"]).shape[0],
        vocab_size=_np(sd["token_embedding.weight"]).shape[0],
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=len(
            {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")}
        ),
    )


def _convert_blocks(sd, prefix: str, layers: int) -> dict:
    def stack(fmt, transpose=False):
        arrs = [_np(sd[fmt.format(i)]) for i in range(layers)]
        out = np.stack(arrs)
        if transpose:
            out = np.swapaxes(out, -1, -2)
        return out

    return {
        "ln_1": {
            "scale": stack(prefix + ".{}.ln_1.weight"),
            "bias": stack(prefix + ".{}.ln_1.bias"),
        },
        "ln_2": {
            "scale": stack(prefix + ".{}.ln_2.weight"),
            "bias": stack(prefix + ".{}.ln_2.bias"),
        },
        "w_qkv": stack(prefix + ".{}.attn.in_proj_weight", transpose=True),
        "b_qkv": stack(prefix + ".{}.attn.in_proj_bias"),
        "w_out": stack(prefix + ".{}.attn.out_proj.weight", transpose=True),
        "b_out": stack(prefix + ".{}.attn.out_proj.bias"),
        "w_fc": stack(prefix + ".{}.mlp.c_fc.weight", transpose=True),
        "b_fc": stack(prefix + ".{}.mlp.c_fc.bias"),
        "w_proj": stack(prefix + ".{}.mlp.c_proj.weight", transpose=True),
        "b_proj": stack(prefix + ".{}.mlp.c_proj.bias"),
    }


def convert_clip_state_dict(sd, cfg: ClipConfig | None = None):
    """Convert a torch CLIP state_dict to (params pytree, ClipConfig)."""
    if cfg is None:
        cfg = config_from_state_dict(sd)
    if cfg.vision_arch == "resnet":
        from .resnet import convert_resnet_visual

        visual, _ = convert_resnet_visual(sd)
        params = {
            "visual": visual,
            "text": {
                "token_embedding": _np(sd["token_embedding.weight"]),
                "pos_embed": _np(sd["positional_embedding"]),
                "blocks": _convert_blocks(
                    sd, "transformer.resblocks", cfg.text_layers
                ),
                "ln_final": {
                    "scale": _np(sd["ln_final.weight"]),
                    "bias": _np(sd["ln_final.bias"]),
                },
                "projection": _np(sd["text_projection"]),
            },
            "logit_scale": _np(sd["logit_scale"]),
        }
        return params, cfg
    conv_w = _np(sd["visual.conv1.weight"])  # (W, 3, p, p)
    patch_embed = conv_w.reshape(conv_w.shape[0], -1).T  # (3*p*p, W)
    params = {
        "visual": {
            "patch_embed": patch_embed,
            "class_embedding": _np(sd["visual.class_embedding"]),
            "pos_embed": _np(sd["visual.positional_embedding"]),
            "ln_pre": {
                "scale": _np(sd["visual.ln_pre.weight"]),
                "bias": _np(sd["visual.ln_pre.bias"]),
            },
            "ln_post": {
                "scale": _np(sd["visual.ln_post.weight"]),
                "bias": _np(sd["visual.ln_post.bias"]),
            },
            "blocks": _convert_blocks(
                sd, "visual.transformer.resblocks", cfg.vision_layers
            ),
            "proj": _np(sd["visual.proj"]),
        },
        "text": {
            "token_embedding": _np(sd["token_embedding.weight"]),
            "pos_embed": _np(sd["positional_embedding"]),
            "blocks": _convert_blocks(sd, "transformer.resblocks", cfg.text_layers),
            "ln_final": {
                "scale": _np(sd["ln_final.weight"]),
                "bias": _np(sd["ln_final.bias"]),
            },
            "projection": _np(sd["text_projection"]),
        },
        "logit_scale": _np(sd["logit_scale"]),
    }
    return params, cfg


def load_clip_checkpoint(path: str):
    """Load an OpenAI CLIP ``.pt`` checkpoint file (requires torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    else:
        sd = obj
    sd = {k: v for k, v in sd.items() if not k.startswith("input_resolution")}
    for k in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(k, None)
    return convert_clip_state_dict(sd)
