"""Shape/behavior tests for the 5 network variants + LAMB parity."""
import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantic_abstraction_tpu.models import (
    RELATIONS,
    ClipSpatialVOOLConfig,
    SemAbs3DConfig,
    SemAbsVOOLConfig,
    SemanticAwareOVSSCConfig,
    SemanticAwareVOOLConfig,
    clip_spatial_vool_forward,
    init_clip_spatial_vool,
    init_semabs3d,
    init_semabs_vool,
    init_semantic_aware_ovssc,
    init_semantic_aware_vool,
    lamb,
    semabs3d_forward,
    semabs_vool_forward,
    semantic_aware_ovssc_forward,
    semantic_aware_vool_forward,
)

TINY = SemAbs3DConfig(
    voxel_shape=(16, 16, 16),
    unet_num_channels=8,
    unet_f_maps=4,
    unet_num_groups=2,
    unet_num_levels=3,
    pts_feat_extractor_hidden_dim=16,
)


def _pts(rs, b, n):
    return jnp.asarray(rs.uniform(-1, 1.9, size=(b, n, 3)).astype(np.float32))


def test_semabs3d_forward_shapes():
    rs = np.random.RandomState(0)
    params = init_semabs3d(jax.random.PRNGKey(0), TINY)
    out = semabs3d_forward(
        params, TINY,
        input_xyz_pts=_pts(rs, 2, 50),
        input_feature_pts=jnp.asarray(rs.randn(2, 3, 50, 1).astype(np.float32)),
        output_xyz_pts=jnp.asarray(rs.uniform(-1, 1.9, (2, 3, 40, 3)).astype(np.float32)),
    )
    assert out.shape == (2, 3, 40)
    assert np.isfinite(np.asarray(out)).all()


def test_semabs3d_shared_volume_broadcast():
    """1 input patch, >1 query groups: volume is shared (net.py:411-417)."""
    rs = np.random.RandomState(1)
    params = init_semabs3d(jax.random.PRNGKey(0), TINY)
    xyz = _pts(rs, 1, 30)
    feats = jnp.asarray(rs.randn(1, 1, 30, 1).astype(np.float32))
    out_pts = jnp.asarray(rs.uniform(-1, 1.9, (1, 4, 20, 3)).astype(np.float32))
    out = semabs3d_forward(params, TINY, xyz, feats, out_pts)
    assert out.shape == (1, 4, 20)
    # same decoder weights + same shared volume: identical query points in
    # different groups must give identical logits
    out2 = semabs3d_forward(
        params, TINY, xyz, feats,
        jnp.broadcast_to(out_pts[:, :1], out_pts.shape),
    )
    o = np.asarray(out2)
    np.testing.assert_allclose(o[:, 0], o[:, 3], rtol=1e-5, atol=1e-5)


def test_semantic_aware_ovssc_shapes():
    rs = np.random.RandomState(2)
    cfg = SemanticAwareOVSSCConfig(
        completion=SemAbs3DConfig(
            voxel_shape=(16, 16, 16), unet_num_channels=8, unet_f_maps=4,
            unet_num_groups=2, unet_num_levels=3,
            pts_feat_extractor_hidden_dim=16,
            network_inputs=("rgb",), output_dim=32,
        ),
        clip_hidden_dim=32,
    )
    params = init_semantic_aware_ovssc(jax.random.PRNGKey(0), cfg)
    out = semantic_aware_ovssc_forward(
        params, cfg,
        input_xyz_pts=_pts(rs, 1, 40),
        input_feature_pts=jnp.asarray(rs.randn(1, 2, 40, 3).astype(np.float32)),
        output_xyz_pts=jnp.asarray(rs.uniform(-1, 1.9, (1, 2, 25, 3)).astype(np.float32)),
        semantic_class_features=jnp.asarray(rs.randn(1, 2, 32).astype(np.float32)),
    )
    assert out.shape == (1, 2, 25)


def test_semabs_vool_shapes():
    rs = np.random.RandomState(3)
    cfg = SemAbsVOOLConfig(completion=TINY, pointing_dim=8)
    params = init_semabs_vool(jax.random.PRNGKey(0), cfg)
    out = semabs_vool_forward(
        params, cfg,
        input_xyz_pts=_pts(rs, 1, 40),
        input_target_saliency_pts=jnp.asarray(rs.randn(1, 2, 40, 1).astype(np.float32)),
        input_reference_saliency_pts=jnp.asarray(rs.randn(1, 2, 40, 1).astype(np.float32)),
        output_xyz_pts=jnp.asarray(rs.uniform(-1, 1.9, (1, 2, 30, 3)).astype(np.float32)),
        spatial_relation_id=jnp.asarray([[0, len(RELATIONS) - 1]]),
    )
    assert out.shape == (1, 2, 30)


def test_semantic_aware_vool_shapes():
    rs = np.random.RandomState(4)
    cfg = SemanticAwareVOOLConfig(
        completion=SemAbs3DConfig(
            voxel_shape=(16, 16, 16), unet_num_channels=8, unet_f_maps=4,
            unet_num_groups=2, unet_num_levels=3,
            pts_feat_extractor_hidden_dim=16,
            network_inputs=("rgb",), output_dim=8,
        ),
        pointing_dim=8, clip_hidden_dim=16,
    )
    params = init_semantic_aware_vool(jax.random.PRNGKey(0), cfg)
    out = semantic_aware_vool_forward(
        params, cfg,
        input_xyz_pts=_pts(rs, 1, 40),
        input_rgb_pts=jnp.asarray(rs.randn(1, 2, 40, 3).astype(np.float32)),
        output_xyz_pts=jnp.asarray(rs.uniform(-1, 1.9, (1, 2, 30, 3)).astype(np.float32)),
        spatial_relation_id=jnp.asarray([[1, 5]]),
        target_obj_features=jnp.asarray(rs.randn(1, 2, 16).astype(np.float32)),
        reference_obj_features=jnp.asarray(rs.randn(1, 2, 16).astype(np.float32)),
    )
    assert out.shape == (1, 2, 30)


def test_clip_spatial_vool_shapes():
    rs = np.random.RandomState(5)
    cfg = ClipSpatialVOOLConfig(completion=TINY)
    params = init_clip_spatial_vool(jax.random.PRNGKey(0), cfg)
    out = clip_spatial_vool_forward(
        params, cfg,
        input_xyz_pts=_pts(rs, 1, 40),
        input_description_saliency_pts=jnp.asarray(rs.randn(1, 2, 40, 1).astype(np.float32)),
        output_xyz_pts=jnp.asarray(rs.uniform(-1, 1.9, (1, 2, 30, 3)).astype(np.float32)),
    )
    assert out.shape == (1, 2, 30)


def test_forward_jits_and_grads():
    rs = np.random.RandomState(6)
    params = init_semabs3d(jax.random.PRNGKey(0), TINY)
    xyz = _pts(rs, 1, 30)
    feats = jnp.asarray(rs.randn(1, 2, 30, 1).astype(np.float32))
    out_pts = jnp.asarray(rs.uniform(-1, 1.9, (1, 2, 20, 3)).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 2, (1, 2, 20)).astype(np.float32))

    @jax.jit
    def loss_fn(p):
        logits = semabs3d_forward(p, TINY, xyz, feats, out_pts)
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_lamb_matches_reference_torch():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_lamb", "/root/reference/arm/optim/lamb.py"
    )
    ref_lamb = importlib.util.module_from_spec(spec)
    sys.modules["ref_lamb"] = ref_lamb
    spec.loader.exec_module(ref_lamb)

    rs = np.random.RandomState(0)
    w0 = rs.randn(5, 4).astype(np.float32)
    grads_seq = [rs.randn(5, 4).astype(np.float32) for _ in range(5)]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = ref_lamb.Lamb([p], lr=1e-2, betas=(0.9, 0.999), weight_decay=1e-5)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    ref_w = p.detach().numpy()

    tx = lamb(1e-2, weight_decay=1e-5)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p_, u: p_ + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), ref_w, atol=1e-6, rtol=1e-5)


def test_semabs_vool_desc_chunk_equivalence():
    """Per-description lax.map execution == all-at-once (desc_chunk=0)."""
    import dataclasses

    rs = np.random.RandomState(11)
    cfg1 = SemAbsVOOLConfig(completion=TINY, pointing_dim=8, desc_chunk=1)
    cfg0 = dataclasses.replace(cfg1, desc_chunk=0)
    params = init_semabs_vool(jax.random.PRNGKey(0), cfg1)
    kwargs = dict(
        input_xyz_pts=_pts(rs, 1, 40),
        input_target_saliency_pts=jnp.asarray(rs.randn(1, 2, 40, 1).astype(np.float32)),
        input_reference_saliency_pts=jnp.asarray(rs.randn(1, 2, 40, 1).astype(np.float32)),
        output_xyz_pts=jnp.asarray(rs.uniform(-1, 1.9, (1, 2, 30, 3)).astype(np.float32)),
        spatial_relation_id=jnp.asarray([[0, 3]]),
    )
    out1 = semabs_vool_forward(params, cfg1, **kwargs)
    out0 = semabs_vool_forward(params, cfg0, **kwargs)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               atol=1e-5, rtol=1e-4)


def test_semabs_vool_unroll_and_stack_equivalence():
    """The unrolled barrier-chained description loop and the stacked
    batch-2 stream pass == the lax.map form, values and grads
    (models/nets.py semabs_vool_forward)."""
    import dataclasses

    rs = np.random.RandomState(12)
    base = SemAbsVOOLConfig(completion=TINY, pointing_dim=8, desc_chunk=1,
                            desc_unroll=False)
    params = init_semabs_vool(jax.random.PRNGKey(0), base)
    kwargs = dict(
        input_xyz_pts=_pts(rs, 1, 40),
        input_target_saliency_pts=jnp.asarray(rs.randn(1, 2, 40, 1).astype(np.float32)),
        input_reference_saliency_pts=jnp.asarray(rs.randn(1, 2, 40, 1).astype(np.float32)),
        output_xyz_pts=jnp.asarray(rs.uniform(-1, 1.9, (1, 2, 30, 3)).astype(np.float32)),
        spatial_relation_id=jnp.asarray([[0, 3]]),
    )

    def loss(p, cfg):
        return (semabs_vool_forward(p, cfg, **kwargs) ** 2).sum()

    want = semabs_vool_forward(params, base, **kwargs)
    gwant = jax.grad(loss)(params, base)
    variants = [
        dataclasses.replace(base, desc_unroll=True),
        dataclasses.replace(base, desc_unroll=True, stack_streams=True),
        dataclasses.replace(base, desc_unroll=True, desc_chunk=2,
                            stack_streams=True),
    ]
    for variant in variants:
        got = semabs_vool_forward(params, variant, **kwargs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-4)
        # grads: same math, different reduction/fusion order, amplified
        # through the temperature-0.07 pointing attention — compare with
        # per-leaf NORMALIZED error (elementwise-relative is meaningless
        # on near-zero elements of an otherwise large leaf)
        gg = jax.grad(loss)(params, variant)
        for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gwant)):
            a, b = np.asarray(a), np.asarray(b)
            err = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
            assert err < 1e-3, (variant, err)


def test_blocked_basis_forward_equivalence():
    """The 128-lane end-to-end basis (blocked scatter -> blocked_io UNet ->
    parity-pack sampler) == the plain path, values AND gradients, for
    SemAbs3D and SemAbsVOOL at a small C=16 config."""
    import dataclasses as _dc

    import jax

    from semantic_abstraction_tpu.models import (
        SemAbs3DConfig,
        SemAbsVOOLConfig,
        init_semabs3d,
        init_semabs_vool,
        semabs3d_forward,
        semabs_vool_forward,
    )
    from semantic_abstraction_tpu.models.nets import blocked_fast_path

    base = dict(
        voxel_shape=(16, 16, 16),
        unet_num_channels=16,
        unet_f_maps=16,
        unet_num_groups=8,
        unet_num_levels=3,
        pts_feat_extractor_hidden_dim=32,
        unet_batch_chunk=0,
        unet_remat_policy="full",
    )
    cfg_b = SemAbs3DConfig(**base)
    cfg_p = SemAbs3DConfig(**base, blocked_basis=False)
    params = init_semabs3d(jax.random.PRNGKey(0), cfg_b)
    assert blocked_fast_path(params, cfg_b)
    assert not blocked_fast_path(params, cfg_p)

    rs = np.random.RandomState(0)
    xyz = jnp.asarray(rs.uniform(-1.2, 2.1, (1, 512, 3)).astype(np.float32))
    feats = jnp.asarray(rs.randn(1, 2, 512, 1).astype(np.float32))
    out_pts = jnp.asarray(
        rs.uniform(-1.2, 2.1, (1, 2, 1024, 3)).astype(np.float32))

    out_b = np.asarray(semabs3d_forward(params, cfg_b, xyz, feats, out_pts))
    out_p = np.asarray(semabs3d_forward(params, cfg_p, xyz, feats, out_pts))
    np.testing.assert_allclose(out_b, out_p, atol=2e-5, rtol=2e-5)

    # gradients through the blocked custom-VJP chain == plain chain
    def loss(pr, cfg):
        return (semabs3d_forward(pr, cfg, xyz, feats, out_pts) ** 2).mean()

    gb = jax.grad(lambda pr: loss(pr, cfg_b))(params)
    gp = jax.grad(lambda pr: loss(pr, cfg_p))(params)
    flat_b = jax.tree_util.tree_leaves(gb)
    flat_p = jax.tree_util.tree_leaves(gp)
    for a, b in zip(flat_b, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)

    # VOOL: two blocked streams sampled separately == channel-concat path
    vcfg_b = SemAbsVOOLConfig(
        completion=_dc.replace(cfg_b, decoder_concat_xyz_pts=False),
        pointing_dim=16, desc_chunk=0,
    )
    vcfg_p = SemAbsVOOLConfig(
        completion=_dc.replace(
            cfg_p, decoder_concat_xyz_pts=False),
        pointing_dim=16, desc_chunk=0,
    )
    vparams = init_semabs_vool(jax.random.PRNGKey(1), vcfg_b)
    tgt = jnp.asarray(rs.randn(1, 2, 512, 1).astype(np.float32))
    ref = jnp.asarray(rs.randn(1, 2, 512, 1).astype(np.float32))
    rel = jnp.asarray(rs.randint(0, 6, (1, 2)).astype(np.int32))
    vout_b = np.asarray(semabs_vool_forward(
        vparams, vcfg_b, xyz, tgt, ref, out_pts, rel))
    vout_p = np.asarray(semabs_vool_forward(
        vparams, vcfg_p, xyz, tgt, ref, out_pts, rel))
    np.testing.assert_allclose(vout_b, vout_p, atol=2e-4, rtol=2e-4)


def test_blocked_basis_12cubed_voxels():
    """Regression: even voxel dims whose HALF is below the blocked-level
    minimum (12^3 -> 6^3 after the blocked_io entry) must still run the
    default-on blocked fast path — the level-0 blocking decision is about
    the LOGICAL full-resolution dims, not the already-halved input."""
    import jax

    from semantic_abstraction_tpu.models import (
        SemAbs3DConfig,
        init_semabs3d,
        semabs3d_forward,
    )
    from semantic_abstraction_tpu.models.nets import blocked_fast_path

    base = dict(
        unet_num_channels=16,
        unet_f_maps=16,
        unet_num_groups=8,
        unet_num_levels=2,
        pts_feat_extractor_hidden_dim=32,
        unet_batch_chunk=0,
        unet_remat_policy="full",
    )
    cfg_b = SemAbs3DConfig(voxel_shape=(12, 12, 12), **base)
    cfg_p = SemAbs3DConfig(voxel_shape=(12, 12, 12), blocked_basis=False,
                           **base)
    params = init_semabs3d(jax.random.PRNGKey(0), cfg_b)
    assert blocked_fast_path(params, cfg_b)
    rs = np.random.RandomState(3)
    xyz = jnp.asarray(rs.uniform(-1.2, 2.1, (1, 256, 3)).astype(np.float32))
    feats = jnp.asarray(rs.randn(1, 2, 256, 1).astype(np.float32))
    out_pts = jnp.asarray(
        rs.uniform(-1.2, 2.1, (1, 2, 512, 3)).astype(np.float32))
    out_b = np.asarray(semabs3d_forward(params, cfg_b, xyz, feats, out_pts))
    out_p = np.asarray(semabs3d_forward(params, cfg_p, xyz, feats, out_pts))
    np.testing.assert_allclose(out_b, out_p, atol=2e-5, rtol=2e-5)
