"""END-TO-END value parity: our composed model forwards vs the reference
net.py networks with converted weights.

The reference net.py is imported as a true oracle (ref_oracle.ref_net_module
shims torch_scatter with torch.scatter_reduce include_self=False, which is
bit-identical to the CUDA extension's semantics). This pins the COMPOSED
quirks — xyz-idx ordering, /grid_shape normalization, truncation cast,
shared-volume broadcast, TSDF channel order, the VOOL completion decoder's
concat_xyz=False — not just the per-piece kernels.

Reference: net.py:319-678; torch nets run fp32 CPU, ours fp32 jit.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_oracle import fake_text_feature, ref_net_module

from semantic_abstraction_tpu.models import (
    RELATIONS,
    ClipSpatialVOOLConfig,
    SemAbs3DConfig,
    SemAbsVOOLConfig,
    SemanticAwareOVSSCConfig,
    SemanticAwareVOOLConfig,
    clip_spatial_vool_forward,
    semabs3d_forward,
    semabs_vool_forward,
    semantic_aware_ovssc_forward,
    semantic_aware_vool_forward,
)
from semantic_abstraction_tpu.models.convert import (
    convert_clip_spatial_vool_state_dict,
    convert_semabs3d_state_dict,
    convert_semabs_vool_state_dict,
    convert_semantic_aware_ovssc_state_dict,
    convert_semantic_aware_vool_state_dict,
)

SCENE_BOUNDS = ((-1.0, -1.0, -0.1), (1.0, 1.0, 1.9))
VOXEL = (16, 16, 16)
UNET = dict(unet_num_channels=8, unet_f_maps=4, unet_num_groups=2,
            unet_num_levels=3)


def _torch():
    import torch

    torch.manual_seed(0)
    return torch


def _ref_kwargs(**overrides):
    kw = dict(
        voxel_shape=VOXEL,
        scene_bounds=SCENE_BOUNDS,
        network_inputs=["saliency"],
        use_pts_feat_extractor=True,
        pts_feat_extractor_hidden_dim=16,
        reduce_method="max",
        batch_size=1,
        device="cpu",
        **UNET,
    )
    kw.update(overrides)
    return kw


def _our_completion_cfg(**overrides):
    base = dict(
        voxel_shape=VOXEL,
        scene_bounds=SCENE_BOUNDS,
        network_inputs=("saliency",),
        use_pts_feat_extractor=True,
        pts_feat_extractor_hidden_dim=16,
        reduce_method="max",
        unet_batch_chunk=0,
        unet_remat_policy="full",
        **UNET,
    )
    base.update(overrides)
    return SemAbs3DConfig(**base)


def _sd_numpy(net):
    return {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}


def _inputs(rs, b=1, p=2, n=256, m=64, f=1):
    return (
        rs.uniform(-1.2, 2.1, (b, n, 3)).astype(np.float32),
        rs.randn(b, p, n, f).astype(np.float32),
        rs.uniform(-1.2, 2.1, (b, p, m, 3)).astype(np.float32),
    )


@pytest.mark.parametrize("concat_xyz", [True, False])
def test_semabs3d_full_forward_parity(concat_xyz):
    torch = _torch()
    refnet = ref_net_module()
    net = refnet.SemAbs3D(
        **_ref_kwargs(decoder_concat_xyz_pts=concat_xyz)
    ).eval()
    rs = np.random.RandomState(0)
    xyz, feats, out_pts = _inputs(rs)
    with torch.no_grad():
        ref = net(
            input_xyz_pts=torch.from_numpy(xyz),
            input_feature_pts=torch.from_numpy(feats),
            tsdf_vol=None,
            output_xyz_pts=torch.from_numpy(out_pts),
        ).numpy()

    cfg = _our_completion_cfg(decoder_concat_xyz_pts=concat_xyz)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_semabs3d_state_dict(_sd_numpy(net))
    )
    ours = np.asarray(
        jax.jit(
            lambda p, a, b_, c: semabs3d_forward(
                p, cfg, a, b_, c, compute_dtype=jnp.float32
            )
        )(params, xyz, feats, out_pts)
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_semabs3d_shared_volume_broadcast_parity():
    """One input patch, Q=3 query groups: the reference repeats the single
    feature volume across queries (net.py:411-417)."""
    torch = _torch()
    refnet = ref_net_module()
    net = refnet.SemAbs3D(**_ref_kwargs(decoder_concat_xyz_pts=True)).eval()
    rs = np.random.RandomState(1)
    xyz, feats, _ = _inputs(rs, p=1)
    out_pts = rs.uniform(-1.2, 2.1, (1, 3, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(
            input_xyz_pts=torch.from_numpy(xyz),
            input_feature_pts=torch.from_numpy(feats),
            tsdf_vol=None,
            output_xyz_pts=torch.from_numpy(out_pts),
        ).numpy()
    cfg = _our_completion_cfg(decoder_concat_xyz_pts=True)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_semabs3d_state_dict(_sd_numpy(net))
    )
    ours = np.asarray(
        semabs3d_forward(params, cfg, xyz, feats, out_pts,
                         compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_semabs3d_tsdf_channel_parity():
    """use_pts_feat_extractor=False + tsdf input channel + mean reduce
    (net.py:349-356, :417-424)."""
    torch = _torch()
    refnet = ref_net_module()
    net = refnet.SemAbs3D(
        **_ref_kwargs(
            network_inputs=["saliency", "tsdf"],
            use_pts_feat_extractor=False,
            reduce_method="mean",
            decoder_concat_xyz_pts=True,
        )
    ).eval()
    rs = np.random.RandomState(2)
    xyz, feats, out_pts = _inputs(rs)
    tsdf = rs.uniform(-1, 1, (1,) + VOXEL).astype(np.float32)
    with torch.no_grad():
        ref = net(
            input_xyz_pts=torch.from_numpy(xyz),
            input_feature_pts=torch.from_numpy(feats),
            tsdf_vol=torch.from_numpy(tsdf),
            output_xyz_pts=torch.from_numpy(out_pts),
        ).numpy()
    cfg = _our_completion_cfg(
        network_inputs=("saliency", "tsdf"),
        use_pts_feat_extractor=False,
        reduce_method="mean",
        decoder_concat_xyz_pts=True,
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_semabs3d_state_dict(_sd_numpy(net))
    )
    ours = np.asarray(
        semabs3d_forward(params, cfg, xyz, feats, out_pts, tsdf_vol=tsdf,
                         compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_semantic_aware_ovssc_parity():
    torch = _torch()
    refnet = ref_net_module()
    net = refnet.SemanticAwareOVSSC(
        pointing_method="cosine_sim",
        clip_hidden_dim=32,
        **_ref_kwargs(network_inputs=["rgb"], decoder_concat_xyz_pts=True),
    ).eval()
    rs = np.random.RandomState(3)
    xyz, feats, out_pts = _inputs(rs, f=3)
    class_feats = rs.randn(1, 2, 32).astype(np.float32)
    with torch.no_grad():
        ref = net(
            semantic_class_features=torch.from_numpy(class_feats),
            input_xyz_pts=torch.from_numpy(xyz),
            input_feature_pts=torch.from_numpy(feats),
            tsdf_vol=None,
            output_xyz_pts=torch.from_numpy(out_pts),
        ).numpy()
    cfg = SemanticAwareOVSSCConfig(
        completion=_our_completion_cfg(
            network_inputs=("rgb",), output_dim=32, decoder_concat_xyz_pts=True
        ),
        pointing_method="cosine_sim",
        clip_hidden_dim=32,
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_semantic_aware_ovssc_state_dict(_sd_numpy(net))
    )
    ours = np.asarray(
        semantic_aware_ovssc_forward(
            params, cfg, xyz, feats, out_pts, class_feats,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def _vool_rel_inputs(rs, b=1, d=3, m=64):
    names = [RELATIONS[i % 6] for i in range(d)]
    rel_name = [[names[i]] * b for i in range(d)]  # NUMDESC x BATCH
    rel_id = np.array(
        [[RELATIONS.index(names[i]) for i in range(d)]] * b, np.int32
    )
    out_pts = rs.uniform(-1.2, 2.1, (b, d, m, 3)).astype(np.float32)
    return rel_name, rel_id, out_pts


def test_semabs_vool_parity():
    torch = _torch()
    refnet = ref_net_module()
    net = refnet.SemAbsVOOL(
        pointing_method="cosine_sim",
        pointing_dim=8,
        decoder_concat_xyz_pts=True,
        **_ref_kwargs(),
    ).eval()
    rs = np.random.RandomState(4)
    d = 3
    xyz = rs.uniform(-1.2, 2.1, (1, 256, 3)).astype(np.float32)
    tgt = rs.randn(1, d, 256, 1).astype(np.float32)
    refsal = rs.randn(1, d, 256, 1).astype(np.float32)
    rel_name, rel_id, out_pts = _vool_rel_inputs(rs, d=d)
    with torch.no_grad():
        ref = net(
            input_xyz_pts=torch.from_numpy(xyz),
            input_target_saliency_pts=torch.from_numpy(tgt),
            input_reference_saliency_pts=torch.from_numpy(refsal),
            tsdf_vol=None,
            output_xyz_pts=torch.from_numpy(out_pts),
            spatial_relation_name=rel_name,
        ).numpy()
    # reference quirk: the completion net's own (unused) decoder is built
    # with concat_xyz_pts=False — the flag is consumed by SemAbsVOOL's
    # signature and never reaches SemAbs3D (net.py:470-486)
    cfg = SemAbsVOOLConfig(
        completion=_our_completion_cfg(decoder_concat_xyz_pts=False),
        pointing_method="cosine_sim",
        pointing_dim=8,
        decoder_concat_xyz_pts=True,
        desc_chunk=0,
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_semabs_vool_state_dict(_sd_numpy(net))
    )
    ours = np.asarray(
        semabs_vool_forward(
            params, cfg, xyz, tgt, refsal, out_pts, rel_id,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_semantic_aware_vool_parity():
    torch = _torch()
    refnet = ref_net_module()
    net = refnet.SemanticAwareVOOL(
        pointing_method="cosine_sim",
        pointing_dim=8,
        clip_hidden_dim=512,
        decoder_concat_xyz_pts=True,
        **_ref_kwargs(network_inputs=["rgb"]),
    ).eval()
    rs = np.random.RandomState(5)
    d = 3
    xyz = rs.uniform(-1.2, 2.1, (1, 256, 3)).astype(np.float32)
    rgb = rs.rand(1, d, 256, 3).astype(np.float32)
    rel_name, rel_id, out_pts = _vool_rel_inputs(rs, d=d)
    targets = ["apple", "mug", "lamp"]
    references = ["desk", "sofa", "shelf"]
    tgt_names = [[targets[i]] for i in range(d)]  # NUMDESC x BATCH
    ref_names = [[references[i]] for i in range(d)]
    with torch.no_grad():
        ref = net(
            input_rgb_pts=torch.from_numpy(rgb),
            spatial_relation_name=rel_name,
            target_obj_name=tgt_names,
            reference_obj_name=ref_names,
            input_xyz_pts=torch.from_numpy(xyz),
            tsdf_vol=None,
            output_xyz_pts=torch.from_numpy(out_pts),
        ).numpy()
    cfg = SemanticAwareVOOLConfig(
        completion=_our_completion_cfg(
            network_inputs=("rgb",), output_dim=8,
            decoder_concat_xyz_pts=False,  # same signature-consumption quirk
        ),
        pointing_method="cosine_sim",
        pointing_dim=8,
        clip_hidden_dim=512,
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_semantic_aware_vool_state_dict(_sd_numpy(net))
    )
    tgt_feats = np.stack([fake_text_feature(t) for t in targets])[None]
    ref_feats = np.stack([fake_text_feature(r) for r in references])[None]
    ours = np.asarray(
        semantic_aware_vool_forward(
            params, cfg, xyz, rgb, out_pts, rel_id,
            target_obj_features=tgt_feats, reference_obj_features=ref_feats,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_clip_spatial_vool_parity():
    torch = _torch()
    refnet = ref_net_module()
    net = refnet.ClipSpatialVOOL(
        decoder_concat_xyz_pts=True, **_ref_kwargs()
    ).eval()
    rs = np.random.RandomState(6)
    d = 3
    xyz = rs.uniform(-1.2, 2.1, (1, 256, 3)).astype(np.float32)
    sal = rs.randn(1, d, 256, 1).astype(np.float32)
    rel_name, _, out_pts = _vool_rel_inputs(rs, d=d)
    with torch.no_grad():
        ref = net(
            input_xyz_pts=torch.from_numpy(xyz),
            input_description_saliency_pts=torch.from_numpy(sal),
            tsdf_vol=None,
            output_xyz_pts=torch.from_numpy(out_pts),
            spatial_relation_name=rel_name,
        ).numpy()
    cfg = ClipSpatialVOOLConfig(
        completion=_our_completion_cfg(decoder_concat_xyz_pts=False),
        decoder_concat_xyz_pts=True,
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_clip_spatial_vool_state_dict(_sd_numpy(net))
    )
    ours = np.asarray(
        clip_spatial_vool_forward(
            params, cfg, xyz, sal, out_pts, compute_dtype=jnp.float32
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
