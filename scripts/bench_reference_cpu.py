"""Same-host CPU comparison: the REFERENCE torch relevancy pipeline vs ours.

``bench.py``'s ``vs_baseline`` denominator is an estimated RTX-3090 floor
(no NVIDIA hardware in this environment). This script provides the one
comparison that IS measurable here: both pipelines, identical random
ViT-B/32 weights (converted, value-parity-tested in
tests/test_saliency_composed_parity.py), identical workload, same CPU,
fp32. The reference's torch modules are imported from /root/reference as
oracles (never copied), exactly as the parity tests do.

Workload: the reference's headline "ours" saliency config
(CLIP/clip/__init__.py:19-31) on a 480x640 image with 9 labels — minus the
color-jitter augmentations (torchvision is absent from this image; jitter
multiplies tile count 6x for BOTH pipelines equally, so the ratio is
unaffected). Flip doubling is kept.

Writes one JSON line; run with ``--out REFBENCH_CPU.json`` to persist.
Usage: python scripts/bench_reference_cpu.py [--labels N] [--no-flip]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

from bench import HEADLINE_LABELS, HEADLINE_PROMPTS

LABELS = list(HEADLINE_LABELS)
PROMPTS = list(HEADLINE_PROMPTS)


def _build_reference(cfg):
    """Assemble the reference ClipWrapper singleton around a random-weight
    ViT-B/32 (reference clip.load() would download; weights come from
    torch.manual_seed instead — cost is weight-independent)."""
    import torch
    from PIL import Image

    from ref_oracle import ref_clip_module, ref_clip_wrapper_module

    me = ref_clip_module("model_explainability")
    wrap = ref_clip_wrapper_module()
    torch.manual_seed(0)
    model = me.CLIP(
        embed_dim=cfg.embed_dim,
        image_resolution=cfg.image_resolution,
        vision_layers=cfg.vision_layers,
        vision_width=cfg.vision_width,
        vision_patch_size=cfg.vision_patch_size,
        context_length=cfg.context_length,
        vocab_size=cfg.vocab_size,
        transformer_width=cfg.text_width,
        transformer_heads=cfg.text_heads,
        transformer_layers=cfg.text_layers,
    ).float().eval()

    from semantic_abstraction_tpu.clip.saliency import (
        CLIP_PIXEL_MEAN,
        CLIP_PIXEL_STD,
    )

    def preprocess(pil_img):
        # clip.load()'s Resize(short side)+CenterCrop == direct square
        # resize for the square tiles create_tiles produces
        im = pil_img.resize(
            (cfg.image_resolution, cfg.image_resolution), Image.BICUBIC
        ).convert("RGB")
        x = np.asarray(im).astype(np.float32) / 255.0
        x = x.transpose(2, 0, 1)
        x = (x - CLIP_PIXEL_MEAN[:, None, None]) / CLIP_PIXEL_STD[:, None, None]
        return torch.from_numpy(x.astype(np.float32))

    GC = wrap.ClipGradcam
    gc = GC.__new__(GC)
    torch.nn.Module.__init__(gc)
    gc.clip_model_name = "ViT-B/32"
    gc.model = model
    gc.preprocess = preprocess
    gc.templates = PROMPTS
    gc.device = "cpu"
    gc.target_classes = None
    gc.num_layers = 10  # reference clip_gradcam.py:37 default
    gc.positive_attn_only = True
    gc.num_res_attn_blocks = cfg.vision_width // 64  # == 12 on ViT-B

    W0 = wrap.ClipWrapper
    W0.device = "cpu"
    W0.clip_model = model
    W0.clip_gradcam = gc
    W0.jittering_transforms = None

    class W(W0):
        """torch>=2 rejects numpy object arrays of slices as indices
        (reference __init__.py:227); re-pack each tile as a real tuple."""

        @classmethod
        def create_tiles(cls, **kwargs):
            tiles, tile_imgs, counts, tile_sizes = W0.create_tiles.__func__(
                cls, **kwargs
            )
            arr = np.empty(len(tiles), dtype=object)
            for i in range(len(tiles)):
                arr[i] = tuple(tiles[i])
            return arr, tile_imgs, counts, tile_sizes

    return W, model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--labels", type=int, default=9)
    ap.add_argument("--no-flip", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # beats forced JAX_PLATFORMS
    import jax.numpy as jnp

    from semantic_abstraction_tpu.clip import (
        ClipSaliency,
        CropSpec,
        SaliencyConfig,
        VIT_B_32,
        convert_clip_state_dict,
    )

    labels = LABELS[: args.labels]
    flip = not args.no_flip
    h, w = 480, 640
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (h, w, 3), dtype=np.uint8)
    crops = [
        {"tile_size": 480, "stride": 120},
        {"tile_size": 320, "stride": 80},
        {"tile_size": 240, "stride": 60},
        {"tile_size": 120, "stride": 30},
    ]

    W, torch_model = _build_reference(VIT_B_32)

    # ours, with the SAME weights
    params, cfg = convert_clip_state_dict(
        {k: v for k, v in torch_model.state_dict().items()}, VIT_B_32
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    ours = ClipSaliency(params, cfg, compute_dtype=jnp.float32,
                        tile_batch_size=32)
    config = SaliencyConfig(
        crops=tuple(CropSpec(c["tile_size"], c["stride"]) for c in crops),
        horizontal_flipping=flip,
        augmentations=0,
    )

    def run_ours():
        t0 = time.perf_counter()
        maps, _ = ours.get_clip_saliency(img, labels, tuple(PROMPTS), config)
        np.asarray(maps)
        return time.perf_counter() - t0

    run_ours()  # warmup: compile
    t_ours = min(run_ours() for _ in range(args.repeats))

    result = {
        "metric": "relevancy_maps_per_sec_cpu_same_host",
        "workload": f"{len(labels)} labels, 480x640, ours crops, "
                    f"flip={flip}, jitter=0 (torchvision absent; scales "
                    f"both pipelines 6x equally), fp32, identical "
                    f"converted random ViT-B/32 weights",
        "ours_s_per_image": round(t_ours, 2),
        "ours_maps_per_sec": round(len(labels) / t_ours, 3),
        "host_vcpus": os.cpu_count(),
    }

    if not args.skip_reference:
        def run_ref():
            t0 = time.perf_counter()
            maps, _ = W.get_clip_saliency(
                img=img,
                text_labels=labels,
                prompts=PROMPTS,
                horizontal_flipping=flip,
                positive_attn_only=True,
                augmentations=0,
                cropping_augmentations=crops,
            )
            maps.float().numpy()
            return time.perf_counter() - t0

        run_ref()  # warmup (torch autotune / allocator)
        t_ref = min(run_ref() for _ in range(args.repeats))
        result.update({
            "reference_s_per_image": round(t_ref, 2),
            "reference_maps_per_sec": round(len(labels) / t_ref, 3),
            "speedup_same_host": round(t_ref / t_ours, 2),
        })

    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
