"""Full feature extractor: frozen DINOv2 backbone + the four MicKey heads.

Counterpart of reference ``MicKey_Extractor`` (mickey_extractor.py:7-64) and
``ComputeCorrespondences`` (compute_correspondences.py:6-92), reorganized
functionally: ``extractor_init`` builds the parameter pytree,
``extract_features`` maps images -> per-patch (kpts, depths, scores, descs),
``compute_correspondences`` runs both images and the matcher.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .dinov2 import VIT_CONFIGS, vit_features_chw, vit_init
from .heads import (
    depth_head_apply,
    depth_head_init,
    desc_head_apply,
    desc_head_init,
    det_head_apply,
    det_head_init,
    offset_head_apply,
    offset_head_init,
)
from .matcher import match_scores, matcher_init

Params = Dict[str, Any]


def extractor_init(key: jax.Array, cfg, include_backbone: bool = True) -> Params:
    ks = jax.random.split(key, 5)
    p: Params = {
        "det_head": det_head_init(ks[0], cfg),
        "det_offset": offset_head_init(ks[1], cfg),
        "depth_head": depth_head_init(ks[2], cfg),
        "dsc_head": desc_head_init(ks[3], cfg),
    }
    if include_backbone:
        p["dinov2"] = vit_init(ks[4], cfg.MICKEY.DINOV2.get("VARIANT", "vit_large"))
    return p


def model_init(key: jax.Array, cfg, include_backbone: bool = True) -> Params:
    k1, k2 = jax.random.split(key)
    p = extractor_init(k1, cfg, include_backbone=include_backbone)
    p["matcher"] = matcher_init(cfg)
    return p


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 batches (raw-cache ingest, data/raw_cache.py) are normalized
    ON DEVICE — the /255 fuses into the patch-embed matmul, and the
    host->device transfer stays 4x smaller. float input passes through
    (already [0, 1], data/io.read_color_image)."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) * (1.0 / 255.0)
    return images


def backbone_features(params: Params, images: jnp.ndarray, cfg, mesh=None) -> jnp.ndarray:
    """Frozen DINOv2 feature map (B, H/df, W/df, C), fp32, stop-gradient."""
    images = normalize_images(images)
    mk = cfg.MICKEY
    df = mk.DINOV2.DOWN_FACTOR
    b, h, w, _ = images.shape
    assert h % df == 0 and w % df == 0, f"image size {(h, w)} not divisible by {df}"
    variant = mk.DINOV2.get("VARIANT", "vit_large")
    interpret = bool(cfg.TPU.get("PALLAS_INTERPRET", False))
    return vit_features_chw(
        params["dinov2"],
        images,
        cfg_dtype=("bfloat16" if mk.DINOV2.FLOAT16 else "float32"),
        use_pallas=cfg.TPU.USE_PALLAS_ATTENTION
        and (interpret or jax.default_backend() != "cpu"),
        num_heads=VIT_CONFIGS[variant]["num_heads"],
        patch_size=df,
        attn_blocks=tuple(cfg.TPU.get("ATTENTION_BLOCKS", (256, 512))),
        scan_unroll=int(cfg.TPU.get("SCAN_UNROLL", 1)),
        mesh=mesh,
        packed=bool(cfg.TPU.get("PACKED_ATTENTION", True)),
        interpret=interpret,
    )


def heads_apply(
    params: Params, fmap: jnp.ndarray, cfg, train: bool = False, axis_name=None
) -> Tuple[Tuple[jnp.ndarray, ...], Params]:
    """The four keypoint heads on a backbone feature map."""
    new_params = dict(params)
    scores, new_params["det_head"] = det_head_apply(params["det_head"], fmap, cfg, train, axis_name)
    kpts, new_params["det_offset"] = offset_head_apply(params["det_offset"], fmap, cfg, train, axis_name)
    depths, new_params["depth_head"] = depth_head_apply(params["depth_head"], fmap, cfg, train, axis_name)
    descs, new_params["dsc_head"] = desc_head_apply(params["dsc_head"], fmap, cfg, train, axis_name)
    return (kpts, depths, scores, descs), new_params


def extract_features(
    params: Params, images: jnp.ndarray, cfg, train: bool = False, axis_name=None, mesh=None
) -> Tuple[Tuple[jnp.ndarray, ...], Params]:
    """images: (B, H, W, 3) in [0, 1]; H, W multiples of DOWN_FACTOR.

    Returns ((kpts, depths, scores, descs), new_params) with feature maps of
    shape (B, H/14, W/14, {2,1,1,128}). The reference crops inputs to
    multiples of 14 at runtime (mickey_extractor.py:46); we require it
    statically (XLA static shapes) — the data pipeline guarantees it.
    """
    fmap = backbone_features(params, images, cfg, mesh=mesh)
    return heads_apply(params, fmap, cfg, train=train, axis_name=axis_name)


def absolute_kpt_coordinates(kpts: jnp.ndarray, down_factor: int) -> jnp.ndarray:
    """(offset + cell grid) * down_factor -> absolute pixels.

    kpts: (B, H, W, 2) with channels (x, y) in [0, 1] patch units.
    Counterpart of ``get_abs_kpts_coordinates`` (compute_correspondences.py:20-31).
    """
    b, h, w, _ = kpts.shape
    gx = jnp.arange(w, dtype=kpts.dtype)[None, None, :]
    gy = jnp.arange(h, dtype=kpts.dtype)[None, :, None]
    abs_x = (kpts[..., 0] + gx) * down_factor
    abs_y = (kpts[..., 1] + gy) * down_factor
    return jnp.stack([abs_x, abs_y], axis=-1)


class Correspondences(NamedTuple):
    """Flattened per-image features + match matrices (reference 'data' dict,
    compute_correspondences.py:81-90). kps are (B, N, 2) absolute pixels."""

    kps0: jnp.ndarray
    depth0: jnp.ndarray  # (B, N, 1)
    scr0: jnp.ndarray  # (B, N, 1)
    dsc0: jnp.ndarray  # (B, N, C)
    kps1: jnp.ndarray
    depth1: jnp.ndarray
    scr1: jnp.ndarray
    dsc1: jnp.ndarray
    scores: jnp.ndarray  # (B, N0, N1) descriptor match scores
    kp_scores: jnp.ndarray  # (B, N0, N1) keypoint-score outer product
    depth_map0: jnp.ndarray  # (B, H, W, 1) for visualization/logging
    depth_map1: jnp.ndarray

    @property
    def final_scores(self) -> jnp.ndarray:
        """scores * kp_scores — the sampling distribution (model.py:198-203)."""
        return self.scores * self.kp_scores


class TopKCorrespondences(NamedTuple):
    """Correspondences for the fused matcher->top-K inference route: the
    dense (B, N0, N1) match matrices are replaced by the top-P (score, flat
    -index) table the fused Pallas kernel emits straight from VMEM
    (ops/fused_matcher.fused_topk_scores). Everything the solver needs —
    nothing the dense route keeps only to be reduced."""

    kps0: jnp.ndarray  # (B, N0, 2) absolute pixels
    depth0: jnp.ndarray  # (B, N0, 1)
    kps1: jnp.ndarray
    depth1: jnp.ndarray
    top_scores: jnp.ndarray  # (B, P) final scores, descending
    top_idx: jnp.ndarray  # (B, P) int32 flat indices into the N0 x N1 matrix
    row_ok: jnp.ndarray  # (B,) sampling-distribution validity


def topk_correspondences_from_heads(params, kpts, depths, scores, descs, cfg):
    """Fused matcher stage on stacked (2B) head outputs: flatten both sides
    and reduce dual_softmax * score-outer-product to its top-P entries
    without materializing the dense matrix (the dense route's
    ``_correspondences_from_heads`` + approx_max_k prefilter collapse into
    one kernel). ``kpts`` must already be absolute pixel coordinates."""
    from ..ops.fused_matcher import dense_topk_scores, fused_topk_scores

    fm = cfg.FEATURE_MATCHER.DUAL_SOFTMAX
    b = kpts.shape[0] // 2
    (k0, k1), (d0, d1), (s0, s1), (c0, c1) = (
        (t[:b], t[b:]) for t in (kpts, depths, scores, descs)
    )
    kps0, depth0, scr0, dsc0 = _flatten_maps(k0, d0, s0, c0)
    kps1, depth1, scr1, dsc1 = _flatten_maps(k1, d1, s1, c1)

    prefilter = int(cfg.TPU.get("SAMPLING_PREFILTER", 0) or 0)
    topl = int(cfg.TPU.get("MATCHER_TOPL", 16))
    interpret = bool(cfg.TPU.get("PALLAS_INTERPRET", False))
    dustbin = params["matcher"].get("dustbin_score", jnp.float32(0.0))
    if cfg.TPU.get("MATCHER_BF16", False):
        dsc0 = dsc0.astype(jnp.bfloat16)
        dsc1 = dsc1.astype(jnp.bfloat16)
    if interpret or jax.default_backend() != "cpu":
        top_scores, top_idx, row_ok = fused_topk_scores(
            dsc0, dsc1, scr0[..., 0], scr1[..., 0], dustbin, prefilter,
            temperature=float(fm.TEMPERATURE), use_dustbin=bool(fm.USE_DUSTBIN),
            row_topl=topl, interpret=interpret,
        )
    else:
        # CPU fallback: dense XLA matcher + the same selection semantics
        match = match_scores(params["matcher"], dsc0, dsc1, cfg, allow_fused=False)
        final = match * scr0 * jnp.swapaxes(scr1, 1, 2)
        top_scores, top_idx, row_ok = dense_topk_scores(final, prefilter, row_topl=topl)
    return TopKCorrespondences(
        kps0=kps0, depth0=depth0, kps1=kps1, depth1=depth1,
        top_scores=top_scores, top_idx=top_idx, row_ok=row_ok,
    )


def _flatten_maps(kpts, depths, scores, descs):
    b, h, w, _ = kpts.shape
    n = h * w
    return (
        kpts.reshape(b, n, 2),
        depths.reshape(b, n, 1),
        scores.reshape(b, n, 1),
        descs.reshape(b, n, -1),
    )


def compute_correspondences(
    params: Params,
    image0: jnp.ndarray,
    image1: jnp.ndarray,
    cfg,
    train: bool = False,
    axis_name=None,
    mesh=None,
    fmap: jnp.ndarray = None,
) -> Tuple[Correspondences, Params]:
    """Run the extractor on both images and build the match matrices.

    The two images are processed as ONE batched extractor call (2B images) —
    unlike the reference's two sequential forward passes
    (compute_correspondences.py:59-60) this keeps the MXU at full batch
    occupancy. Documented deviation: in train mode, BatchNorm batch statistics
    are therefore computed over the stacked 2B images rather than per B-image
    pass — a strictly larger-sample estimate of the same statistics. Eval mode
    (running stats) is bit-comparable; see tests/test_parity_full_model.py.

    ``fmap``: optional precomputed (2B, H/df, W/df, C) backbone feature map
    (image0-rows then image1-rows). The backbone is frozen (stop_gradient),
    so callers may run it as a SEPARATE jitted program and feed its output
    here — mathematically identical, and the staged train step
    (training/train_step.py::make_staged_train_step) uses exactly this to
    share the inference backbone program and avoid monolith scheduling
    pathologies (BENCHLOG round 3). When ``fmap`` is given the images may be
    None (they are otherwise unused) — the cached train step
    (training/feature_cache.py) feeds disk-cached features and never ships
    images at all.
    """
    df = cfg.MICKEY.DINOV2.DOWN_FACTOR
    if fmap is None:
        b = image0.shape[0]
        stacked = jnp.concatenate([image0, image1], axis=0)
        fmap = backbone_features(params, stacked, cfg, mesh=mesh)
    else:
        b = fmap.shape[0] // 2 if image0 is None else image0.shape[0]
        # cached features may be stored rounded to bf16 (half the disk and
        # host->device traffic); the heads always consume fp32
        fmap = fmap.astype(jnp.float32)
    (kpts, depths, scores, descs), new_params = heads_apply(
        params, fmap, cfg, train=train, axis_name=axis_name
    )
    kpts = absolute_kpt_coordinates(kpts, df)
    (k0, k1), (d0, d1), (s0, s1), (c0, c1) = (
        (t[:b], t[b:]) for t in (kpts, depths, scores, descs)
    )

    kps0, depth0, scr0, dsc0 = _flatten_maps(k0, d0, s0, c0)
    kps1, depth1, scr1, dsc1 = _flatten_maps(k1, d1, s1, c1)

    # fused Pallas matcher is forward-only; training needs autodiff -> XLA path
    match = match_scores(params["matcher"], dsc0, dsc1, cfg, allow_fused=not train)
    kp_scores = jnp.einsum(
        "bni,bmi->bnm", scr0, scr1, precision=jax.lax.Precision.HIGHEST
    )

    corr = Correspondences(
        kps0=kps0,
        depth0=depth0,
        scr0=scr0,
        dsc0=dsc0,
        kps1=kps1,
        depth1=depth1,
        scr1=scr1,
        dsc1=dsc1,
        scores=match,
        kp_scores=kp_scores,
        depth_map0=d0,
        depth_map1=d1,
    )
    return corr, new_params


class TrainTopKCorrespondences(NamedTuple):
    """Correspondences for the fused matcher->top-K TRAINING route
    (cfg.TPU.TRAIN_FUSED_TOPK): per-image features stay grad-carrying, the
    dense match matrices are replaced by the detached top-P sampling table +
    the grad-carrying row/column logsumexps that reconstruct log final
    scores at sampled entries (ops/fused_matcher.fused_topk_scores_train)."""

    kps0: jnp.ndarray  # (B, N0, 2) absolute pixels, grad-carrying
    depth0: jnp.ndarray  # (B, N0, 1)
    scr0: jnp.ndarray  # (B, N0, 1)
    dsc0: jnp.ndarray  # (B, N0, C)
    kps1: jnp.ndarray
    depth1: jnp.ndarray
    scr1: jnp.ndarray
    dsc1: jnp.ndarray
    top_scores: jnp.ndarray  # (B, P) detached final scores, descending
    top_idx: jnp.ndarray  # (B, P) int32 flat indices
    row_ok: jnp.ndarray  # (B,)
    lse_row: jnp.ndarray  # (B, N0) grad-carrying
    lse_col: jnp.ndarray  # (B, N1) grad-carrying


def compute_correspondences_topk_train(
    params: Params,
    image0: jnp.ndarray,
    image1: jnp.ndarray,
    cfg,
    axis_name=None,
    mesh=None,
    fmap: jnp.ndarray = None,
) -> Tuple[TrainTopKCorrespondences, Params]:
    """Training-route analog of ``compute_correspondences`` that never
    materializes the dense match matrices (train=True implied): heads on the
    stacked 2B feature map, then ops/fused_matcher.fused_topk_scores_train
    (dense XLA fallback off-TPU). Consumed by
    training/loss.py::metric_pose_loss_topk via train_step's
    cfg.TPU.TRAIN_FUSED_TOPK gate."""
    from ..ops.fused_matcher import dense_topk_scores_train, fused_topk_scores_train

    assert cfg.FEATURE_MATCHER.TYPE == "DualSoftmax", (
        "TRAIN_FUSED_TOPK supports the DualSoftmax matcher only"
    )
    df = cfg.MICKEY.DINOV2.DOWN_FACTOR
    if fmap is None:
        b = image0.shape[0]
        stacked = jnp.concatenate([image0, image1], axis=0)
        fmap = backbone_features(params, stacked, cfg, mesh=mesh)
    else:
        b = fmap.shape[0] // 2 if image0 is None else image0.shape[0]
        fmap = fmap.astype(jnp.float32)
    (kpts, depths, scores, descs), new_params = heads_apply(
        params, fmap, cfg, train=True, axis_name=axis_name
    )
    kpts = absolute_kpt_coordinates(kpts, df)
    (k0, k1), (d0, d1), (s0, s1), (c0, c1) = (
        (t[:b], t[b:]) for t in (kpts, depths, scores, descs)
    )
    kps0, depth0, scr0, dsc0 = _flatten_maps(k0, d0, s0, c0)
    kps1, depth1, scr1, dsc1 = _flatten_maps(k1, d1, s1, c1)

    fm = cfg.FEATURE_MATCHER.DUAL_SOFTMAX
    prefilter = int(cfg.TPU.get("SAMPLING_PREFILTER", 0) or 0)
    topl = int(cfg.TPU.get("MATCHER_TOPL", 16))
    interpret = bool(cfg.TPU.get("PALLAS_INTERPRET", False))
    dustbin = params["matcher"].get("dustbin_score", jnp.float32(0.0))
    kw = dict(
        prefilter=prefilter, temperature=float(fm.TEMPERATURE),
        use_dustbin=bool(fm.USE_DUSTBIN), row_topl=topl,
    )
    if interpret or jax.default_backend() != "cpu":
        tk = fused_topk_scores_train(
            dsc0, dsc1, scr0[..., 0], scr1[..., 0], dustbin, interpret=interpret, **kw
        )
    else:
        tk = dense_topk_scores_train(dsc0, dsc1, scr0[..., 0], scr1[..., 0], dustbin, **kw)

    corr = TrainTopKCorrespondences(
        kps0=kps0, depth0=depth0, scr0=scr0, dsc0=dsc0,
        kps1=kps1, depth1=depth1, scr1=scr1, dsc1=dsc1,
        top_scores=tk[0], top_idx=tk[1], row_ok=tk[2], lse_row=tk[3], lse_col=tk[4],
    )
    return corr, new_params
