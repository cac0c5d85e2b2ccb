"""Config-layer parity: the CLI constructor (`model_cfg_from_args`) must
produce param templates that SHAPE-match the oracle reference nets built
the way the reference train scripts build them — ``net_class(**vars(args))``
(reference train_ovssc.py:170-195, train_vool.py:209-233, utils.py:237-254).

This pins the VOOL completion-decoder quirk at the CONFIG layer: the
reference pops ``decoder_concat_xyz_pts`` in SemAbsVOOL/ClipSpatialVOOL's
signatures before the inner ``SemAbs3D(**kwargs)`` (net.py:475-486,
:640-648), whose own default is False (net.py:334) — so every reference
VOOL completion decoder has NO xyz concat even though the argparse default
is True (utils.py:77). A CLI-trained model whose template diverges here
cannot load a released checkpoint.
"""
import numpy as np
import pytest

import jax

from ref_oracle import ref_net_module

from semantic_abstraction_tpu.cli import common
from semantic_abstraction_tpu.runtime.experiment import (
    APPROACHES,
    model_cfg_from_args,
)
from semantic_abstraction_tpu.models.convert import (
    convert_clip_spatial_vool_state_dict,
    convert_semabs3d_state_dict,
    convert_semabs_vool_state_dict,
    convert_semantic_aware_ovssc_state_dict,
    convert_semantic_aware_vool_state_dict,
)

TINY = [
    "--file_path", "/tmp/unused",
    "--voxel_shape", "16", "16", "16",
    "--unet_f_maps", "4",
    "--unet_num_channels", "8",
    "--unet_num_groups", "2",
    "--unet_num_levels", "3",
    "--pts_feat_extractor_hidden_dim", "16",
    "--pointing_dim", "8",
]

CONVERTERS = {
    ("ovssc", "semantic_abstraction"): convert_semabs3d_state_dict,
    ("ovssc", "semantic_aware"): convert_semantic_aware_ovssc_state_dict,
    ("vool", "semantic_abstraction"): convert_semabs_vool_state_dict,
    ("vool", "semantic_aware"): convert_semantic_aware_vool_state_dict,
    ("vool", "clip_spatial"): convert_clip_spatial_vool_state_dict,
}


def _args():
    return common.config_parser().parse_args(TINY)


def _ref_base_kwargs(args, network_inputs):
    """The net-relevant subset of ``vars(args)`` as the reference's
    get_net forwards it to ``net_class(**kwargs)`` (utils.py:237-254)."""
    b = args.scene_bounds
    return dict(
        voxel_shape=tuple(args.voxel_shape),
        scene_bounds=[list(b[:3]), list(b[3:])],
        unet_num_channels=args.unet_num_channels,
        unet_f_maps=args.unet_f_maps,
        unet_num_groups=args.unet_num_groups,
        unet_num_levels=args.unet_num_levels,
        network_inputs=list(network_inputs),
        use_pts_feat_extractor=args.use_pts_feat_extractor,
        pts_feat_extractor_hidden_dim=args.pts_feat_extractor_hidden_dim,
        reduce_method=args.reduce_method,
        decoder_concat_xyz_pts=args.decoder_concat_xyz_pts,
        batch_size=1,
        device="cpu",
    )


def _build_ref_net(task, approach, args):
    import torch

    refnet = ref_net_module()
    torch.manual_seed(0)
    # train_ovssc.py:183-184 / train_vool.py:222-223: semantic_aware
    # overwrites network_inputs with ["rgb"] before get_net
    inputs = ["rgb"] if approach == "semantic_aware" else args.network_inputs
    kw = _ref_base_kwargs(args, inputs)
    if task == "ovssc":
        if approach == "semantic_aware":
            return refnet.SemanticAwareOVSSC(
                pointing_method=args.pointing_method, **kw
            )
        return refnet.SemAbs3D(**kw)
    if approach == "semantic_aware":
        return refnet.SemanticAwareVOOL(
            pointing_method=args.pointing_method,
            pointing_dim=args.pointing_dim, **kw,
        )
    if approach == "clip_spatial":
        return refnet.ClipSpatialVOOL(**kw)
    return refnet.SemAbsVOOL(
        pointing_method=args.pointing_method,
        pointing_dim=args.pointing_dim, **kw,
    )


def _shapes(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return treedef, [np.shape(leaf) for leaf in leaves]


@pytest.mark.parametrize(
    "task,approach", sorted(APPROACHES.keys())
)
def test_cli_cfg_template_matches_reference(task, approach):
    args = _args()
    cfg = model_cfg_from_args(task, approach, args)
    _, init_fn = APPROACHES[(task, approach)]
    ours = init_fn(jax.random.PRNGKey(0), cfg)

    net = _build_ref_net(task, approach, args)
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    converted = CONVERTERS[(task, approach)](sd)

    our_def, our_shapes = _shapes(ours)
    ref_def, ref_shapes = _shapes(converted)
    assert our_def == ref_def, (
        f"{task}/{approach}: CLI param-tree structure diverges from the "
        f"converted reference net"
    )
    mismatches = [
        (path, a, b)
        for (path, _), a, b in zip(
            jax.tree_util.tree_flatten_with_path(ours)[0],
            our_shapes, ref_shapes,
        )
        if a != b
    ]
    assert not mismatches, f"{task}/{approach}: shape mismatches {mismatches}"


def test_vool_cli_completion_decoder_has_no_xyz_concat():
    """Direct pin of the quirk: all three VOOL approaches' completion
    configs must carry decoder_concat_xyz_pts=False even when the CLI flag
    (default True, cli/common.py) is set."""
    args = _args()
    assert args.decoder_concat_xyz_pts is True
    for approach in ("semantic_abstraction", "semantic_aware", "clip_spatial"):
        cfg = model_cfg_from_args("vool", approach, args)
        assert cfg.completion.decoder_concat_xyz_pts is False, approach
    # ...while OVSSC passes the flag through (SemAbs3D consumes vars(args))
    assert model_cfg_from_args(
        "ovssc", "semantic_abstraction", args
    ).decoder_concat_xyz_pts is True
    assert model_cfg_from_args(
        "ovssc", "semantic_aware", args
    ).completion.decoder_concat_xyz_pts is True
