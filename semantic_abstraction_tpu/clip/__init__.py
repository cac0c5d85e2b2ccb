from .model import (
    ClipConfig,
    VIT_B_32,
    init_clip_params,
    vit_forward,
    encode_image,
    encode_text,
)
from .tokenizer import ClipTokenizer, tokenize, default_tokenizer
from .relevancy import gradcam, gradcam_jit, zeroshot_weights_from_features
from .convert import convert_clip_state_dict, load_clip_checkpoint
from .resnet import convert_resnet_visual, modified_resnet_forward
from .saliency import (
    ClipSaliency,
    SaliencyConfig,
    CropSpec,
    saliency_configs,
    ours_config,
    chefer_et_al_config,
    IMAGENET_TEMPLATES,
    color_jitter,
    extract_tiles,
    tile_plan,
)

__all__ = [
    "ClipConfig",
    "VIT_B_32",
    "init_clip_params",
    "vit_forward",
    "encode_image",
    "encode_text",
    "ClipTokenizer",
    "tokenize",
    "default_tokenizer",
    "gradcam",
    "gradcam_jit",
    "zeroshot_weights_from_features",
    "convert_clip_state_dict",
    "convert_resnet_visual",
    "modified_resnet_forward",
    "load_clip_checkpoint",
    "ClipSaliency",
    "SaliencyConfig",
    "CropSpec",
    "saliency_configs",
    "ours_config",
    "chefer_et_al_config",
    "IMAGENET_TEMPLATES",
    "color_jitter",
    "extract_tiles",
    "tile_plan",
]
