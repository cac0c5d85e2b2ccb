"""Semantic-abstraction 3D completion networks, pure JAX.

TPU-native re-architecture of the reference's model family (reference:
net.py:319-678): SemAbs3D (OVSSC "ours"), SemanticAwareOVSSC,
SemAbsVOOL ("ours"), SemanticAwareVOOL, ClipSpatialVOOL.

Departures from the torch classes:
- Models are (config dataclass, init fn, pure apply fn) triples over pytree
  params — no modules, no stateful ``self.visual_volumetric_features``;
  the VOOL nets take the feature volume explicitly from
  :func:`semabs3d_feature_vol` instead of reading it off the module.
- String-keyed relation embeddings (reference ParameterDict, net.py:490-503)
  become a (7, D) table indexed by integer relation ids (``RELATIONS``
  fixes the vocabulary order); the host data pipeline maps names -> ids so
  the apply fns stay jittable.
- SemanticAwareVOOL's CLIP text features (fetched via ClipWrapper inside
  forward in the reference, net.py:594-602) are explicit inputs computed
  once host-side.
- The UNet runs in a configurable ``compute_dtype`` (bf16 on TPU).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.voxel import VoxelGrid
from .decoder import (
    _init_linear,
    _linear,
    implicit_decoder,
    init_implicit_decoder,
    init_pointing_attention,
    pointing_attention,
    pointing_attention_paired,
)
from .unet3d import (
    init_residual_unet3d,
    residual_unet3d,
    unet_blocked_io_ok,
)


def blocked_fast_path(completion_params: dict, cfg) -> bool:
    """True iff the 128-lane end-to-end basis is engaged for this
    completion model: the voxel scatter emits the space-to-depth blocked
    volume directly, the UNet runs blocked_io (no s2d entry / d2s exit),
    and the implicit decoder samples the blocked basis with the
    parity-pack sampler — no 16-lane volume ever materializes
    (KERNELS.md: narrow trailing axes pay 8x their bytes in (8,128)
    tiles; this basis removed ~130 ms/step of relayout copies from the
    round-4 OVSSC profile). Falls back automatically for tsdf-channel
    inputs (the concat would interleave blocked lanes), non-16-channel
    UNet inputs, and shapes whose level 0 cannot block."""
    return (
        getattr(cfg, "blocked_basis", True)
        and "tsdf" not in cfg.network_inputs
        and 8 * cfg.unet_in_channels == 128
        and unet_blocked_io_ok(completion_params["unet"], cfg.voxel_shape)
    )

# Fixed relation vocabulary (reference net.py:490-503 ParameterDict keys).
RELATIONS = (
    "in",
    "behind",
    "in front of",
    "on the left of",
    "on the right of",
    "on",
    "[pad]",
)
RELATION_TO_ID = {r: i for i, r in enumerate(RELATIONS)}


@dataclasses.dataclass(frozen=True)
class SemAbs3DConfig:
    """Reference defaults from utils.py:38-100."""

    voxel_shape: Tuple[int, int, int] = (128, 128, 128)
    scene_bounds: Tuple[Tuple[float, float, float], Tuple[float, float, float]] = (
        (-1.0, -1.0, -0.1),
        (1.0, 1.0, 1.9),
    )
    unet_num_channels: int = 16
    unet_f_maps: int = 16
    unet_num_groups: int = 8
    unet_num_levels: int = 6
    # UNet applied to this many (batch x patch) volumes at a time via
    # lax.map; chunking trades no FLOPs for a smaller HBM peak (0 = all at
    # once). After the GN/blocked-conv/sampler memory fixes, all 4 patches
    # at once fit a v5e and are fastest (measured: 1.15 s/step at chunk 4
    # vs 1.28 at chunk 2 vs OOM pre-fixes); lower this on smaller-HBM
    # parts or for batch > 1 per chip.
    unet_batch_chunk: int = 4
    # remat policy for the UNet blocks: "dots" (fastest that fits the
    # single-stream model) or "full" (lowest memory; needed for VOOL's
    # two completion streams)
    unet_remat_policy: str = "dots"
    network_inputs: Tuple[str, ...] = ("saliency",)
    use_pts_feat_extractor: bool = True
    pts_feat_extractor_hidden_dim: int = 128
    reduce_method: str = "max"
    output_dim: int = 1
    decoder_concat_xyz_pts: bool = True

    # The 128-lane end-to-end basis (see :func:`blocked_fast_path`):
    # scatter -> UNet -> sampler all stay in the space-to-depth blocked
    # layout. Value-identical to the plain path (tested); this switch
    # exists for A/B measurement and as an escape hatch.
    blocked_basis: bool = True

    # Honor ``reduce_method`` in the voxel scatter instead of reproducing
    # the reference quirk. QUIRK (net.py:186-199): VirtualGrid.scatter_points
    # assigns its ``reduce_method`` argument to a local that is never used —
    # the actual torch_scatter call reads ``self.reduce_method``, i.e. the
    # VirtualGrid's OWN field, which SemAbs3D.__init__ never sets (net.py:
    # 339-344), so it stays at the ctor default "mean". Every reference
    # model therefore scatters with MEAN regardless of --reduce_method, and
    # the released checkpoints were trained that way; checkpoint parity
    # requires the quirk (the default). The eval-metrics voxelizer is NOT
    # affected (utils.py:633-638 passes reduce_method="max" to the ctor).
    honor_reduce_method: bool = False

    @property
    def effective_reduce_method(self) -> str:
        return self.reduce_method if self.honor_reduce_method else "mean"

    @property
    def pts_feature_dim(self) -> int:
        return (
            ("saliency" in self.network_inputs)
            + 3 * ("rgb" in self.network_inputs)
            + ("patch_masks" in self.network_inputs)
        )

    @property
    def unet_in_channels(self) -> int:
        if self.use_pts_feat_extractor:
            return self.unet_num_channels
        return self.pts_feature_dim + ("tsdf" in self.network_inputs)

    @property
    def grid(self) -> VoxelGrid:
        return VoxelGrid(
            lower=self.scene_bounds[0],
            upper=self.scene_bounds[1],
            grid_shape=self.voxel_shape,
        )


def init_semabs3d(key: jax.Array, cfg: SemAbs3DConfig, dtype=jnp.float32) -> dict:
    kp, ku, kd = jax.random.split(key, 3)
    params = {}
    if cfg.use_pts_feat_extractor:
        assert cfg.reduce_method == "max"  # reference net.py:368
        h = cfg.pts_feat_extractor_hidden_dim
        out = cfg.unet_num_channels - int("tsdf" in cfg.network_inputs)
        k1, k2, k3 = jax.random.split(kp, 3)
        params["pts_feat_extractor"] = {
            "fc1": _init_linear(k1, cfg.pts_feature_dim + 3, h, dtype),
            "fc2": _init_linear(k2, h, h, dtype),
            "fc3": _init_linear(k3, h, out, dtype),
        }
    params["unet"] = init_residual_unet3d(
        ku,
        in_channels=cfg.unet_in_channels,
        out_channels=cfg.unet_num_channels,
        f_maps=cfg.unet_f_maps,
        num_levels=cfg.unet_num_levels,
        dtype=dtype,
    )
    params["decoder"] = init_implicit_decoder(
        kd, cfg.unet_num_channels, cfg.output_dim, cfg.decoder_concat_xyz_pts, dtype
    )
    return params


def _pts_feat_mlp(p: dict, x: jax.Array) -> jax.Array:
    x = jax.nn.leaky_relu(_linear(p["fc1"], x), 0.01)
    x = jax.nn.leaky_relu(_linear(p["fc2"], x), 0.01)
    return _linear(p["fc3"], x)


def semabs3d_feature_vol(
    params: dict,
    cfg: SemAbs3DConfig,
    input_xyz_pts: jax.Array,
    input_feature_pts: jax.Array,
    tsdf_vol: Optional[jax.Array] = None,
    valid_mask: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    layout: str = "cl",
) -> jax.Array:
    """Point features -> UNet feature volume (B*P, C, gx, gy, gz).

    input_xyz_pts (B, N, 3), input_feature_pts (B, P, N, F). Mirrors
    reference SemAbs3D.forward up to the UNet (net.py:383-424): per-patch
    xyz repeat, optional pts-feature MLP on cat(xyz, feats), voxel
    max/mean scatter, optional TSDF channel concat, 3D ResUNet.
    ``valid_mask`` (B, N) drops padded points from the scatter.

    LAYOUT: with the default ``layout="cl"`` the returned volume is
    CHANNEL-LAST, (B*P, gx, gy, gz, C) — the scatter emits that form for
    free and the implicit decoder's neighborhood pack wants it; NCDHW
    round-trips cost two ~270 MB relayouts per step at the full-size
    config. ``layout="blocked_cl"`` (precondition:
    :func:`blocked_fast_path`) keeps the whole path in the space-to-depth
    basis — scatter emits (B*P, gx/2, gy/2, gz/2, 8C), the UNet runs
    blocked_io, and the return is the blocked OUTPUT volume for the
    parity-pack sampler.
    """
    b, p, n, f = input_feature_pts.shape
    blocked = layout == "blocked_cl"
    xyz = jnp.broadcast_to(input_xyz_pts[:, None], (b, p, n, 3)).reshape(b * p, n, 3)
    feats = input_feature_pts.reshape(b * p, n, f)
    if cfg.use_pts_feat_extractor:
        feats = _pts_feat_mlp(
            params["pts_feat_extractor"], jnp.concatenate([xyz, feats], axis=-1)
        )
    if valid_mask is not None:
        valid_mask = jnp.broadcast_to(valid_mask[:, None], (b, p, n)).reshape(b * p, n)
    if blocked:
        assert "tsdf" not in cfg.network_inputs, (
            "blocked layout cannot concat a tsdf channel (lane interleave)"
        )
        vol = cfg.grid.scatter_points(
            xyz, feats, reduce_method=cfg.effective_reduce_method,
            valid_mask=valid_mask, layout="blocked_cl",
        )
    else:
        vol = cfg.grid.scatter_points(
            xyz, feats, reduce_method=cfg.effective_reduce_method,
            valid_mask=valid_mask, channels_last=True,
        )
    # cast to the compute dtype HERE rather than at the UNet entry: the
    # UNet's remat closure captures this tensor and re-derives the first
    # conv's input from it in the backward — saving it f32 cost an extra
    # f32 relayout pass per step (measured ~13 ms at the 128^3 config)
    vol = vol.astype(compute_dtype)
    if "tsdf" in cfg.network_inputs:
        tsdf = jnp.broadcast_to(
            tsdf_vol[:, None], (b, p) + tsdf_vol.shape[1:]
        ).reshape(b * p, *tsdf_vol.shape[1:])
        if tsdf.ndim == 4:
            tsdf = tsdf[..., None]
        vol = jnp.concatenate([tsdf.astype(vol.dtype), vol], axis=-1)
    unet_kw = dict(
        compute_dtype=compute_dtype, remat_policy=cfg.unet_remat_policy,
        channels_last=not blocked, blocked_io=blocked,
    )
    chunk = cfg.unet_batch_chunk
    if chunk and vol.shape[0] > chunk and vol.shape[0] % chunk == 0:
        vols = vol.reshape(vol.shape[0] // chunk, chunk, *vol.shape[1:])
        out = jax.lax.map(
            lambda v: residual_unet3d(
                params["unet"], v, cfg.unet_num_groups, **unet_kw
            ),
            vols,
        )
        return out.reshape(vol.shape[0], *out.shape[2:])
    return residual_unet3d(
        params["unet"], vol, cfg.unet_num_groups, **unet_kw
    )


def semabs3d_forward(
    params: dict,
    cfg: SemAbs3DConfig,
    input_xyz_pts: jax.Array,
    input_feature_pts: jax.Array,
    output_xyz_pts: jax.Array,
    tsdf_vol: Optional[jax.Array] = None,
    valid_mask: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Full SemAbs3D (reference net.py:383-439).

    output_xyz_pts (B, Q, M, 3) -> logits (B, Q, M) when output_dim == 1,
    else (B, Q, M, output_dim). If the input has one patch and Q > 1, the
    feature volume is shared across queries (reference net.py:411-417).
    """
    b, p = input_feature_pts.shape[:2]
    q, m = output_xyz_pts.shape[1:3]
    blocked = blocked_fast_path(params, cfg)
    vols = semabs3d_feature_vol(
        params, cfg, input_xyz_pts, input_feature_pts, tsdf_vol, valid_mask,
        compute_dtype, layout="blocked_cl" if blocked else "cl",
    )
    if p < q:
        vols = jnp.broadcast_to(
            vols.reshape(b, p, *vols.shape[1:]), (b, q) + vols.shape[1:]
        ).reshape(b * q, *vols.shape[1:])
    out = implicit_decoder(
        params["decoder"],
        vols,
        cfg.grid,
        output_xyz_pts.reshape(b * q, m, 3),
        cfg.decoder_concat_xyz_pts,
        channels_last=True,
        blocked=blocked,
    ).reshape(b, q, m, cfg.output_dim)
    if cfg.output_dim == 1:
        out = out[..., 0]
    return out


# ---------------------------------------------------------------------------
# OVSSC variants
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SemanticAwareOVSSCConfig:
    """SemAbs3D with CLIP-dim output + class-feature pointer (net.py:442-466)."""

    completion: SemAbs3DConfig = dataclasses.field(
        default_factory=lambda: SemAbs3DConfig(
            network_inputs=("rgb",), output_dim=512
        )
    )
    pointing_method: str = "cosine_sim"
    pointing_temperature: float = 0.07
    clip_hidden_dim: int = 512


def init_semantic_aware_ovssc(key, cfg: SemanticAwareOVSSCConfig, dtype=jnp.float32):
    kc, kp = jax.random.split(key)
    return {
        "completion": init_semabs3d(kc, cfg.completion, dtype),
        "pointer": init_pointing_attention(
            kp, cfg.clip_hidden_dim, cfg.pointing_method, dtype
        ),
    }


def semantic_aware_ovssc_forward(
    params: dict,
    cfg: SemanticAwareOVSSCConfig,
    input_xyz_pts: jax.Array,
    input_feature_pts: jax.Array,
    output_xyz_pts: jax.Array,
    semantic_class_features: jax.Array,
    tsdf_vol: Optional[jax.Array] = None,
    valid_mask: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """semantic_class_features (B, P, E) -> per-point class logits (B, P, M)."""
    sampled = semabs3d_forward(
        params["completion"], cfg.completion, input_xyz_pts, input_feature_pts,
        output_xyz_pts, tsdf_vol, valid_mask, compute_dtype,
    )  # (B, P, M, E)
    return pointing_attention_paired(
        params["pointer"],
        key=semantic_class_features,
        query=sampled,
        method=cfg.pointing_method,
        pointing_dim=cfg.clip_hidden_dim,
        temperature=cfg.pointing_temperature,
    )


# ---------------------------------------------------------------------------
# VOOL variants
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SemAbsVOOLConfig:
    """Two-stream completion + learned relation pointer (net.py:469-579).

    The completion default uses unet_batch_chunk=2: VOOL holds TWO UNet
    passes (target + reference streams) plus a 2C spatial sampler, and the
    full-size step OOMs a v5e at chunk 4 (20.6 vs 15.75 GB).

    Completion decoder quirk: the reference pops ``decoder_concat_xyz_pts``
    from the kwargs before building the inner SemAbs3D (net.py:469-486),
    whose own default is False (net.py:334) — so every reference VOOL
    completion decoder has NO xyz concat; only the spatial_sampler gets the
    flag. The completion default here mirrors that."""

    completion: SemAbs3DConfig = dataclasses.field(
        default_factory=lambda: SemAbs3DConfig(
            unet_batch_chunk=2, unet_remat_policy="full",
            decoder_concat_xyz_pts=False,
        )
    )
    pointing_method: str = "cosine_sim"
    pointing_dim: int = 64
    pointing_temperature: float = 0.07
    decoder_concat_xyz_pts: bool = True
    # process this many descriptions per chunk (0 = all at once):
    # per-description execution bounds the live set to ONE pair of UNet
    # feature volumes + one decode, which is what fits the full-size
    # two-stream model on a 16 GB chip
    desc_chunk: int = 1
    # emit the per-description chunks as an UNROLLED barrier-chained
    # python loop instead of lax.map: the while-loop form cost ~580
    # ms/step in loop machinery at the full-size regime (see
    # semabs_vool_forward)
    desc_unroll: bool = True
    # how many desc chunks ahead the unrolled loop may run: 0 = strict
    # serialization (one volume pair live), 1 = overlap the next chunk's
    # DMA/inits with the current chunk's compute (a second pair live)
    desc_lookahead: int = 0
    # run target+reference through ONE stacked batch-2 UNet pass per
    # description instead of two batch-1 passes
    stack_streams: bool = False


def init_semabs_vool(key, cfg: SemAbsVOOLConfig, dtype=jnp.float32):
    kc, ks, kp, kr = jax.random.split(key, 4)
    return {
        "completion": init_semabs3d(kc, cfg.completion, dtype),
        "spatial_sampler": init_implicit_decoder(
            ks, 2 * cfg.completion.unet_num_channels, cfg.pointing_dim,
            cfg.decoder_concat_xyz_pts, dtype,
        ),
        "pointer": init_pointing_attention(kp, cfg.pointing_dim, cfg.pointing_method, dtype),
        "relation_embeddings": jax.random.normal(
            kr, (len(RELATIONS), cfg.pointing_dim), dtype
        ),
    }


def semabs_vool_forward(
    params: dict,
    cfg: SemAbsVOOLConfig,
    input_xyz_pts: jax.Array,
    input_target_saliency_pts: jax.Array,
    input_reference_saliency_pts: jax.Array,
    output_xyz_pts: jax.Array,
    spatial_relation_id: jax.Array,
    tsdf_vol: Optional[jax.Array] = None,
    valid_mask: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Saliency streams (B, D, N, 1) + relation ids (B, D) -> logits (B, D, M)."""
    b, nd, m = output_xyz_pts.shape[:3]

    blocked = blocked_fast_path(params["completion"], cfg.completion)
    vol_layout = "blocked_cl" if blocked else "cl"

    def streams_to_sampled(tgt, ref, out_pts):
        """(B', D', N, 1) streams + (B'*D', M, 3) -> sampled (B'*D', M, pd)."""
        if cfg.stack_streams and tgt.shape[0] == 1:
            # one UNet pass over both streams stacked on the patch axis
            # (2x the batch, half the dispatches; both volumes are live
            # simultaneously at the concat anyway)
            d_ = tgt.shape[1]
            both = semabs3d_feature_vol(
                params["completion"], cfg.completion, input_xyz_pts,
                jnp.concatenate([tgt, ref], axis=1),
                tsdf_vol, valid_mask, compute_dtype, layout=vol_layout,
            )
            target_vol, reference_vol = both[:d_], both[d_:]
        else:
            target_vol = semabs3d_feature_vol(
                params["completion"], cfg.completion, input_xyz_pts, tgt,
                tsdf_vol, valid_mask, compute_dtype, layout=vol_layout,
            )
            reference_vol = semabs3d_feature_vol(
                params["completion"], cfg.completion, input_xyz_pts, ref,
                tsdf_vol, valid_mask, compute_dtype, layout=vol_layout,
            )
        if blocked:
            # a lane concat of two blocked volumes would interleave their
            # slot-major orders; sampling each stream's blocked volume and
            # concatenating the SAMPLED (M, C) features is value-identical
            # (trilinear sampling is per-channel)
            feature_vol = (target_vol, reference_vol)
        else:
            feature_vol = jnp.concatenate([target_vol, reference_vol], axis=-1)
        return implicit_decoder(
            params["spatial_sampler"], feature_vol, cfg.completion.grid,
            out_pts, cfg.decoder_concat_xyz_pts, channels_last=True,
            blocked=blocked,
        )

    dchunk = cfg.desc_chunk
    if dchunk and b == 1 and nd > dchunk and nd % dchunk == 0:
        if cfg.desc_unroll:
            # UNROLLED per-description execution: the lax.map form spent
            # ~580 ms/step (half the step) in while-loop machinery at the
            # full-size regime — loop-boundary dynamic slices, stacked
            # loop-carried buffer copies, and un-overlapped DMA waits.
            # A python loop emits the same per-description work without
            # the loop ops; the optimization_barrier chains each chunk's
            # inputs to the previous chunk's output so XLA's scheduler
            # keeps ONE (target, reference) volume pair live at a time
            # (the all-at-once schedule OOMs 16 GB HBM).
            outs = []
            lookahead = int(cfg.desc_lookahead)
            for d0 in range(0, nd, dchunk):
                tgt_d = input_target_saliency_pts[:, d0:d0 + dchunk]
                ref_d = input_reference_saliency_pts[:, d0:d0 + dchunk]
                out_d = output_xyz_pts[:, d0:d0 + dchunk].reshape(dchunk, m, 3)
                # chain chunk k's inputs to chunk k-1-lookahead's output:
                # lookahead=0 keeps ONE (target, reference) volume pair
                # live (the all-at-once schedule OOMs 16 GB HBM);
                # lookahead=1 lets the scheduler overlap chunk k's
                # zero-inits/DMA with chunk k-1's compute at the cost of a
                # second live pair
                if len(outs) > lookahead:
                    tgt_d, ref_d, out_d, _ = jax.lax.optimization_barrier(
                        (tgt_d, ref_d, out_d, outs[-1 - lookahead]))
                outs.append(streams_to_sampled(tgt_d, ref_d, out_d))
            sampled = jnp.concatenate(outs, axis=0)  # (nd, m, pd)
        else:
            # per-description execution: one (target, reference) volume
            # pair live at a time (see desc_unroll for the faster form)
            tgt = input_target_saliency_pts.reshape(
                nd // dchunk, 1, dchunk, -1, 1)
            ref = input_reference_saliency_pts.reshape(
                nd // dchunk, 1, dchunk, -1, 1)
            outp = output_xyz_pts.reshape(nd // dchunk, dchunk, m, 3)
            sampled = jax.lax.map(
                lambda args: streams_to_sampled(*args), (tgt, ref, outp)
            ).reshape(nd, m, -1)
    else:
        sampled = streams_to_sampled(
            input_target_saliency_pts, input_reference_saliency_pts,
            output_xyz_pts.reshape(b * nd, m, 3),
        )  # (B*D, M, pointing_dim)
    rel = params["relation_embeddings"][spatial_relation_id]  # (B, D, pd)
    logits = pointing_attention(
        params["pointer"],
        key=sampled,
        query=rel.reshape(b * nd, 1, -1),
        method=cfg.pointing_method,
        pointing_dim=cfg.pointing_dim,
        temperature=cfg.pointing_temperature,
    )
    return logits.reshape(b, nd, m)


@dataclasses.dataclass(frozen=True)
class SemanticAwareVOOLConfig:
    """RGB-in baseline with CLIP text-feature queries (net.py:582-636).

    Inherits SemAbsVOOL's completion-decoder quirk (net.py:469-486, :334):
    the inner decoder is built with concat_xyz=False, and here the quirk is
    VALUE-affecting — this variant uses the completion decoder's output
    directly (net.py:623-626)."""

    completion: SemAbs3DConfig = dataclasses.field(
        default_factory=lambda: SemAbs3DConfig(
            network_inputs=("rgb",), output_dim=64,
            decoder_concat_xyz_pts=False,
        )
    )
    pointing_method: str = "cosine_sim"
    pointing_dim: int = 64
    pointing_temperature: float = 0.07
    clip_hidden_dim: int = 512


def init_semantic_aware_vool(key, cfg: SemanticAwareVOOLConfig, dtype=jnp.float32):
    kc, kp, kr, km = jax.random.split(key, 4)
    return {
        "completion": init_semabs3d(kc, cfg.completion, dtype),
        "pointer": init_pointing_attention(kp, cfg.pointing_dim, cfg.pointing_method, dtype),
        "relation_embeddings": jax.random.normal(
            kr, (len(RELATIONS), cfg.pointing_dim), dtype
        ),
        "query_mlp": _init_linear(
            km, 2 * cfg.clip_hidden_dim + cfg.pointing_dim, cfg.pointing_dim, dtype
        ),
    }


def semantic_aware_vool_forward(
    params: dict,
    cfg: SemanticAwareVOOLConfig,
    input_xyz_pts: jax.Array,
    input_rgb_pts: jax.Array,
    output_xyz_pts: jax.Array,
    spatial_relation_id: jax.Array,
    target_obj_features: jax.Array,
    reference_obj_features: jax.Array,
    tsdf_vol: Optional[jax.Array] = None,
    valid_mask: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """input_rgb_pts (B, D, N, 3); target/reference_obj_features (B, D, E)
    are CLIP text features computed host-side (reference fetches them inside
    forward via ClipWrapper, net.py:594-602)."""
    b, nd, m = output_xyz_pts.shape[:3]
    sampled = semabs3d_forward(
        params["completion"], cfg.completion, input_xyz_pts, input_rgb_pts,
        output_xyz_pts, tsdf_vol, valid_mask, compute_dtype,
    )  # (B, D, M, pointing_dim)
    rel = params["relation_embeddings"][spatial_relation_id]  # (B, D, pd)
    query = _linear(
        params["query_mlp"],
        jnp.concatenate(
            [
                target_obj_features.astype(rel.dtype),
                reference_obj_features.astype(rel.dtype),
                rel,
            ],
            axis=-1,
        ),
    )
    logits = pointing_attention(
        params["pointer"],
        key=sampled.reshape(b * nd, m, -1),
        query=query.reshape(b * nd, 1, -1),
        method=cfg.pointing_method,
        pointing_dim=cfg.pointing_dim,
        temperature=cfg.pointing_temperature,
    )
    return logits.reshape(b, nd, m)


@dataclasses.dataclass(frozen=True)
class ClipSpatialVOOLConfig:
    """Full-description relevancy baseline, no learned relations (net.py:639-678).

    Same completion-decoder quirk as SemAbsVOOL: the reference consumes
    ``decoder_concat_xyz_pts`` before the inner SemAbs3D (net.py:640-648),
    so the completion decoder is built with concat_xyz=False."""

    completion: SemAbs3DConfig = dataclasses.field(
        default_factory=lambda: SemAbs3DConfig(decoder_concat_xyz_pts=False)
    )
    decoder_concat_xyz_pts: bool = True


def init_clip_spatial_vool(key, cfg: ClipSpatialVOOLConfig, dtype=jnp.float32):
    kc, ks = jax.random.split(key)
    return {
        "completion": init_semabs3d(kc, cfg.completion, dtype),
        "spatial_sampler": init_implicit_decoder(
            ks, cfg.completion.unet_num_channels, 1, cfg.decoder_concat_xyz_pts, dtype
        ),
    }


def clip_spatial_vool_forward(
    params: dict,
    cfg: ClipSpatialVOOLConfig,
    input_xyz_pts: jax.Array,
    input_description_saliency_pts: jax.Array,
    output_xyz_pts: jax.Array,
    tsdf_vol: Optional[jax.Array] = None,
    valid_mask: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    b, nd, m = output_xyz_pts.shape[:3]
    blocked = blocked_fast_path(params["completion"], cfg.completion)
    feature_vol = semabs3d_feature_vol(
        params["completion"], cfg.completion, input_xyz_pts,
        input_description_saliency_pts, tsdf_vol, valid_mask, compute_dtype,
        layout="blocked_cl" if blocked else "cl",
    )
    out = implicit_decoder(
        params["spatial_sampler"],
        feature_vol,
        cfg.completion.grid,
        output_xyz_pts.reshape(b * nd, m, 3),
        cfg.decoder_concat_xyz_pts,
        channels_last=True,
        blocked=blocked,
    )
    return out.reshape(b, nd, m)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
