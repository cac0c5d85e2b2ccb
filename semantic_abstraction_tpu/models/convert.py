"""torch net checkpoint -> param pytree converters for the model family.

Offline conversion of the reference's released checkpoints
(reference: utils.py:276-290 handles the DDP "module." prefix; module
layouts at net.py:319-678). torch is a dev-only dependency used to read
``.pth`` files; Linear weights (out, in) transpose to (in, out) for
right-multiplication; the ``steps`` buffer is dropped; string-keyed
relation embeddings (ParameterDict) stack into the (7, D) table in
``RELATIONS`` order.
"""
from __future__ import annotations

import numpy as np

from .nets import RELATIONS


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def strip_ddp_prefix(sd: dict) -> dict:
    """Remove the DistributedDataParallel "module." prefix
    (reference utils.py:280-289)."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return sd


def _linear(sd, prefix):
    return {"w": _np(sd[prefix + ".weight"]).T, "b": _np(sd[prefix + ".bias"])}


def _implicit_decoder(sd, prefix):
    """ImplicitVolumetricDecoder.mlp = Sequential(Linear, LeakyReLU, Linear)
    (net.py:208-214)."""
    return {
        "fc1": _linear(sd, prefix + ".mlp.0"),
        "fc2": _linear(sd, prefix + ".mlp.2"),
    }


def _pointer(sd, prefix):
    key = prefix + ".pointer_v.weight"
    if key in sd:
        return {"v": _np(sd[key]).T}
    return {}


def convert_semabs3d_state_dict(sd: dict, prefix: str = "") -> dict:
    """SemAbs3D (net.py:319-439): pts_feat_extractor (Sequential
    Linear-LReLU-Linear-LReLU-Linear), ResidualUNet3D, implicit decoder."""
    from .unet3d import convert_unet3d_state_dict

    sd = strip_ddp_prefix(sd)
    params = {}
    if prefix + "pts_feat_extractor.0.weight" in sd:
        params["pts_feat_extractor"] = {
            "fc1": _linear(sd, prefix + "pts_feat_extractor.0"),
            "fc2": _linear(sd, prefix + "pts_feat_extractor.2"),
            "fc3": _linear(sd, prefix + "pts_feat_extractor.4"),
        }
    params["unet"] = convert_unet3d_state_dict(
        sd, prefix=prefix + "vol_feature_extractor."
    )
    params["decoder"] = _implicit_decoder(sd, prefix + "visual_sampler")
    return params


def convert_semantic_aware_ovssc_state_dict(sd: dict) -> dict:
    sd = strip_ddp_prefix(sd)
    return {
        "completion": convert_semabs3d_state_dict(sd),
        "pointer": _pointer(sd, "semantic_class_pointer"),
    }


def _relation_embeddings(sd, prefix="relation_embeddings"):
    rows = []
    for rel in RELATIONS:
        key = f"{prefix}.{rel}"
        rows.append(_np(sd[key]))
    return np.stack(rows)


def convert_semabs_vool_state_dict(sd: dict) -> dict:
    """SemAbsVOOL (net.py:469-579)."""
    sd = strip_ddp_prefix(sd)
    return {
        "completion": convert_semabs3d_state_dict(sd, prefix="completion_net."),
        "spatial_sampler": _implicit_decoder(sd, "spatial_sampler"),
        "pointer": _pointer(sd, "pointer"),
        "relation_embeddings": _relation_embeddings(sd),
    }


def convert_semantic_aware_vool_state_dict(sd: dict) -> dict:
    sd = strip_ddp_prefix(sd)
    return {
        "completion": convert_semabs3d_state_dict(sd, prefix="completion_net."),
        "pointer": _pointer(sd, "pointer"),
        "relation_embeddings": _relation_embeddings(sd),
        "query_mlp": _linear(sd, "mlp"),
    }


def convert_clip_spatial_vool_state_dict(sd: dict) -> dict:
    sd = strip_ddp_prefix(sd)
    return {
        "completion": convert_semabs3d_state_dict(sd, prefix="completion_net."),
        "spatial_sampler": _implicit_decoder(sd, "spatial_sampler"),
    }


NET_CONVERTERS = {
    ("ovssc", "semantic_abstraction"): convert_semabs3d_state_dict,
    ("ovssc", "semantic_aware"): convert_semantic_aware_ovssc_state_dict,
    ("vool", "semantic_abstraction"): convert_semabs_vool_state_dict,
    ("vool", "semantic_aware"): convert_semantic_aware_vool_state_dict,
    ("vool", "clip_spatial"): convert_clip_spatial_vool_state_dict,
}


def load_torch_net_checkpoint(path: str, task: str, approach: str):
    """Load a reference ``.pth`` training checkpoint -> (params, epoch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["net"] if isinstance(ckpt, dict) and "net" in ckpt else ckpt
    params = NET_CONVERTERS[(task, approach)](sd)
    import jax.numpy as jnp
    import jax

    params = jax.tree_util.tree_map(jnp.asarray, params)
    epoch = ckpt.get("epochs", 0) if isinstance(ckpt, dict) else 0
    return params, epoch
