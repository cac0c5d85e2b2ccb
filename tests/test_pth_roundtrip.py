"""FILE-LEVEL ``.pth`` checkpoint round-trip: torch.save in the reference
training-checkpoint layout -> ``load_torch_net_checkpoint`` /
``load_net_checkpoint`` -> forward parity vs the torch oracle.

``tests/test_ref_net_parity.py`` pins the in-memory state-dict converters;
this pins everything the RELEASED artifacts additionally exercise
(reference utils.py:548-556 save layout ``{"net", "optimizer", "epochs"}``,
DDP "module." key prefixes from utils.py:256-258, torch.load deserialize,
and the runtime glue that swaps converted params into a TrainState). With
the artifact download blocked (zero egress, PARITY.md), this is the
strongest checkpoint-parity evidence available offline: only the weight
VALUES differ from a real released file.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_oracle import ref_net_module
from test_ref_net_parity import (
    _inputs,
    _our_completion_cfg,
    _ref_kwargs,
    _sd_numpy,
    _vool_rel_inputs,
)

from semantic_abstraction_tpu.models import (
    SemAbsVOOLConfig,
    init_semabs_vool,
    semabs3d_forward,
    semabs_vool_forward,
)
from semantic_abstraction_tpu.models.convert import load_torch_net_checkpoint


def _torch():
    import torch

    torch.manual_seed(0)
    return torch


def _save_reference_ckpt(torch, path, net, epochs, ddp_prefix):
    """Write a .pth exactly as the reference training loop does
    (utils.py:548-556); DDP runs save with "module."-prefixed keys."""
    sd = net.state_dict()
    if ddp_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    torch.save({"net": sd, "optimizer": {}, "epochs": epochs}, path)


@pytest.mark.parametrize("ddp_prefix", [False, True])
def test_pth_ovssc_file_roundtrip(tmp_path, ddp_prefix):
    torch = _torch()
    refnet = ref_net_module()
    net = refnet.SemAbs3D(**_ref_kwargs(decoder_concat_xyz_pts=True)).eval()
    path = str(tmp_path / "ovssc_latest.pth")
    _save_reference_ckpt(torch, path, net, epochs=7, ddp_prefix=ddp_prefix)

    params, epoch = load_torch_net_checkpoint(
        path, "ovssc", "semantic_abstraction"
    )
    assert epoch == 7

    rs = np.random.RandomState(1)
    xyz, feats, out_pts = _inputs(rs)
    with torch.no_grad():
        ref = net(
            input_xyz_pts=torch.from_numpy(xyz),
            input_feature_pts=torch.from_numpy(feats),
            tsdf_vol=None,
            output_xyz_pts=torch.from_numpy(out_pts),
        ).numpy()
    cfg = _our_completion_cfg(decoder_concat_xyz_pts=True)
    ours = np.asarray(
        semabs3d_forward(params, cfg, xyz, feats, out_pts,
                         compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_pth_vool_train_state_roundtrip(tmp_path):
    """The runtime glue: eval/visualize restore a .pth INTO a TrainState
    template via load_net_checkpoint (runtime/checkpoint.py:83-98)."""
    torch = _torch()
    refnet = ref_net_module()
    net = refnet.SemAbsVOOL(
        pointing_method="cosine_sim",
        pointing_dim=8,
        decoder_concat_xyz_pts=True,
        **_ref_kwargs(),
    ).eval()
    path = str(tmp_path / "vool_latest.pth")
    _save_reference_ckpt(torch, path, net, epochs=3, ddp_prefix=True)

    cfg = SemAbsVOOLConfig(
        completion=_our_completion_cfg(decoder_concat_xyz_pts=False),
        pointing_method="cosine_sim",
        pointing_dim=8,
        decoder_concat_xyz_pts=True,
        desc_chunk=0,
    )
    from semantic_abstraction_tpu.runtime import (
        init_train_state,
        make_optimizer,
    )
    from semantic_abstraction_tpu.runtime.checkpoint import (
        load_net_checkpoint,
    )

    template = init_train_state(
        init_semabs_vool(jax.random.PRNGKey(0), cfg), make_optimizer()
    )
    state, epoch = load_net_checkpoint(path, template, "vool",
                                       "semantic_abstraction")
    assert epoch == 3
    # converted params must drop into the init template's exact structure
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_equal(a.shape, b.shape),
        template.params, state.params,
    )

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
    ours = np.asarray(
        semabs_vool_forward(
            state.params, cfg, xyz, tgt, refsal, out_pts, rel_id,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
