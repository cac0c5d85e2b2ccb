"""Net checkpoint converter tests: synthetic reference-layout state dicts
-> pytrees matching our init shapes (the reference net.py itself cannot be
imported — torch_scatter is absent — so the torch layout is reproduced
from its module definitions, net.py:319-678)."""
import numpy as np
import pytest

import jax

from semantic_abstraction_tpu.models import (
    RELATIONS,
    SemAbs3DConfig,
    SemAbsVOOLConfig,
    init_semabs3d,
    init_semabs_vool,
)
from semantic_abstraction_tpu.models.convert import (
    convert_semabs3d_state_dict,
    convert_semabs_vool_state_dict,
    strip_ddp_prefix,
)

CFG = SemAbs3DConfig(
    voxel_shape=(16, 16, 16),
    unet_num_channels=8,
    unet_f_maps=4,
    unet_num_groups=2,
    unet_num_levels=3,
    pts_feat_extractor_hidden_dim=16,
)


def _unet_sd(prefix, in_ch, out_ch, f_maps, levels, rs):
    sd = {}
    fmaps = [f_maps * 2**k for k in range(levels)]

    def block(base, cin, cout):
        for j, (ci, co) in enumerate(
            [(cin, cout), (cout, cout), (cout, cout)], start=1
        ):
            sd[f"{base}.conv{j}.groupnorm.weight"] = rs.randn(ci)
            sd[f"{base}.conv{j}.groupnorm.bias"] = rs.randn(ci)
            sd[f"{base}.conv{j}.conv.weight"] = rs.randn(co, ci, 3, 3, 3)

    prev = in_ch
    for i, c in enumerate(fmaps):
        block(f"{prefix}encoders.{i}.basic_module", prev, c)
        prev = c
    rev = list(reversed(fmaps))
    for i in range(len(rev) - 1):
        cin, cout = rev[i], rev[i + 1]
        sd[f"{prefix}decoders.{i}.upsampling.upsample.weight"] = rs.randn(
            cin, cout, 3, 3, 3
        )
        sd[f"{prefix}decoders.{i}.upsampling.upsample.bias"] = rs.randn(cout)
        block(f"{prefix}decoders.{i}.basic_module", cout, cout)
    sd[f"{prefix}final_conv.weight"] = rs.randn(out_ch, fmaps[0], 1, 1, 1)
    sd[f"{prefix}final_conv.bias"] = rs.randn(out_ch)
    return sd


def _semabs3d_sd(prefix, rs, cfg=CFG):
    sd = {}
    h = cfg.pts_feat_extractor_hidden_dim
    dims = [(cfg.pts_feature_dim + 3, h), (h, h), (h, cfg.unet_num_channels)]
    for i, (din, dout) in zip((0, 2, 4), dims):
        sd[f"{prefix}pts_feat_extractor.{i}.weight"] = rs.randn(dout, din)
        sd[f"{prefix}pts_feat_extractor.{i}.bias"] = rs.randn(dout)
    sd.update(
        _unet_sd(f"{prefix}vol_feature_extractor.", cfg.unet_in_channels,
                 cfg.unet_num_channels, cfg.unet_f_maps, cfg.unet_num_levels, rs)
    )
    dec_in = cfg.unet_num_channels + 3 * cfg.decoder_concat_xyz_pts
    sd[f"{prefix}visual_sampler.mlp.0.weight"] = rs.randn(cfg.unet_num_channels, dec_in)
    sd[f"{prefix}visual_sampler.mlp.0.bias"] = rs.randn(cfg.unet_num_channels)
    sd[f"{prefix}visual_sampler.mlp.2.weight"] = rs.randn(
        cfg.output_dim, cfg.unet_num_channels
    )
    sd[f"{prefix}visual_sampler.mlp.2.bias"] = rs.randn(cfg.output_dim)
    sd[f"{prefix}steps"] = np.zeros(1)
    return sd


def _shapes(t):
    return jax.tree_util.tree_map(lambda a: tuple(np.asarray(a).shape), t)


def test_semabs3d_converter_shapes():
    rs = np.random.RandomState(0)
    sd = _semabs3d_sd("", rs)
    params = convert_semabs3d_state_dict(sd)
    ours = init_semabs3d(jax.random.PRNGKey(0), CFG)
    assert _shapes(params) == _shapes(ours)


def test_ddp_prefix_stripped():
    rs = np.random.RandomState(1)
    sd = {f"module.{k}": v for k, v in _semabs3d_sd("", rs).items()}
    params = convert_semabs3d_state_dict(sd)
    ours = init_semabs3d(jax.random.PRNGKey(0), CFG)
    assert _shapes(params) == _shapes(ours)


def test_vool_converter_shapes():
    rs = np.random.RandomState(2)
    vcfg = SemAbsVOOLConfig(completion=CFG, pointing_dim=8)
    sd = _semabs3d_sd("completion_net.", rs)
    ss_in = 2 * CFG.unet_num_channels + 3
    sd["spatial_sampler.mlp.0.weight"] = rs.randn(2 * CFG.unet_num_channels, ss_in)
    sd["spatial_sampler.mlp.0.bias"] = rs.randn(2 * CFG.unet_num_channels)
    sd["spatial_sampler.mlp.2.weight"] = rs.randn(8, 2 * CFG.unet_num_channels)
    sd["spatial_sampler.mlp.2.bias"] = rs.randn(8)
    for rel in RELATIONS:
        sd[f"relation_embeddings.{rel}"] = rs.randn(8)
    params = convert_semabs_vool_state_dict(sd)
    ours = init_semabs_vool(jax.random.PRNGKey(0), vcfg)
    assert _shapes(params) == _shapes(ours)
    # relation table stacked in RELATIONS order
    np.testing.assert_allclose(
        np.asarray(params["relation_embeddings"][0]),
        sd["relation_embeddings.in"],
        rtol=1e-6,
    )


def test_linear_weights_transposed():
    rs = np.random.RandomState(3)
    sd = _semabs3d_sd("", rs)
    params = convert_semabs3d_state_dict(sd)
    w_torch = sd["pts_feat_extractor.0.weight"]  # (out, in)
    np.testing.assert_allclose(
        np.asarray(params["pts_feat_extractor"]["fc1"]["w"]), w_torch.T, rtol=1e-6
    )
