"""Full-composition golden parity: our trunk vs the reference
``ComputeCorrespondences`` (extractor + matcher), end to end.

The per-module parity suites (heads, backbone, matcher) don't exercise the
composition — head wiring, absolute-coordinate construction, flattening
order, scores * kp_scores — or the full-state_dict conversion the released
``mickey.ckpt`` will go through exactly once in production. This test builds
the reference ``ComputeCorrespondences`` with RANDOM weights (vit_small
backbone substituted for vit_large — same code path, 12 blocks instead of
24), converts the WHOLE state_dict (backbone included) via the checkpoint
converters, and compares every trunk output. Reference:
``lib/models/MicKey/modules/compute_correspondences.py:6-92``.

Eval mode is the production inference path and must match to fp32 tolerance.
Train mode: our production trunk runs both images as ONE stacked 2B batch
(better MXU occupancy), which makes train-mode BatchNorm batch statistics
differ from the reference's two separate B-sized extractor calls — a
documented deviation. Train-mode parity is therefore checked with per-image
head passes composing the same functions.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mickey_tpu.config import default_config  # noqa: E402
from mickey_tpu.nn.extractor import (  # noqa: E402
    absolute_kpt_coordinates,
    backbone_features,
    compute_correspondences,
    heads_apply,
)
from mickey_tpu.nn.matcher import match_scores  # noqa: E402
from mickey_tpu.training.checkpoint import (  # noqa: E402
    convert_dinov2_state_dict,
    convert_mickey_state_dict,
)

BLOCKS_DIM = [32, 16, 128, 8]
DSC_DIM = 16
B, H, W = 2, 70, 56  # 5x4 patch grid -> N=20 keypoints

REF_CFG = {
    "MICKEY": {
        "DINOV2": {"CHANNEL_DIM": 384, "DOWN_FACTOR": 14, "FLOAT16": False},
        "KP_HEADS": {
            "BLOCKS_DIM": BLOCKS_DIM,
            "BN": True,
            "USE_SOFTMAX": True,
            "USE_DEPTHSIGMOID": False,
            "MAX_DEPTH": 60,
            "POS_ENCODING": True,
        },
        "DSC_HEAD": {
            "LAST_DIM": DSC_DIM,
            "BLOCKS_DIM": BLOCKS_DIM[:3],
            "NORM_DSC": True,
            "POS_ENCODING": True,
        },
    },
    "FEATURE_MATCHER": {
        "TYPE": "DualSoftmax",
        "DUAL_SOFTMAX": {"TEMPERATURE": 0.1, "USE_DUSTBIN": True},
    },
}


def tpu_cfg():
    cfg = default_config()
    cfg.MICKEY.DINOV2.VARIANT = "vit_small"
    cfg.MICKEY.DINOV2.CHANNEL_DIM = 384
    cfg.MICKEY.DINOV2.FLOAT16 = False
    cfg.MICKEY.KP_HEADS.BLOCKS_DIM = BLOCKS_DIM
    cfg.MICKEY.DSC_HEAD.LAST_DIM = DSC_DIM
    cfg.TPU.USE_PALLAS_ATTENTION = False
    return cfg


@pytest.fixture(autouse=True)
def _highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


@pytest.fixture(scope="module")
def ref_model():
    """Reference ComputeCorrespondences with a random vit_small backbone."""
    import lib.models.MicKey.modules.mickey_extractor as me
    from lib.models.MicKey.modules.compute_correspondences import (
        ComputeCorrespondences,
    )
    from lib.models.MicKey.modules.DINO_modules.dinov2 import vit_small

    torch.manual_seed(0)
    vit = vit_small(
        img_size=518, patch_size=14, init_values=1.0, ffn_layer="mlp", block_chunks=0
    )
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        vit.pos_embed.copy_(0.02 * torch.randn(vit.pos_embed.shape, generator=g))
        vit.cls_token.copy_(0.02 * torch.randn(vit.cls_token.shape, generator=g))

    # No network egress: substitute vit_small + a local random state_dict for
    # the vit_large download at MicKey_Extractor init (mickey_extractor.py:14-17)
    orig_vit_large = me.vit_large
    orig_hub = torch.hub.load_state_dict_from_url
    me.vit_large = vit_small
    torch.hub.load_state_dict_from_url = lambda *a, **k: vit.state_dict()
    try:
        torch.manual_seed(2)
        model = ComputeCorrespondences(REF_CFG)
    finally:
        me.vit_large = orig_vit_large
        torch.hub.load_state_dict_from_url = orig_hub

    # non-trivial BN running stats so eval-mode parity exercises them
    g = torch.Generator().manual_seed(3)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return model


@pytest.fixture(scope="module")
def converted_params(ref_model):
    """Full state_dict -> params pytree through the production converters."""
    params = convert_mickey_state_dict(ref_model.state_dict())
    params["dinov2"] = convert_dinov2_state_dict(
        ref_model.extractor.dinov2_vitl14.state_dict(), depth=12
    )
    return jax.tree.map(jnp.asarray, params)


def _images(seed=5):
    rng = np.random.default_rng(seed)
    im0 = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    im1 = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    return im0, im1


def _ref_forward(ref_model, im0, im1):
    data = {
        "image0": torch.from_numpy(im0.transpose(0, 3, 1, 2)),
        "image1": torch.from_numpy(im1.transpose(0, 3, 1, 2)),
    }
    with torch.no_grad():
        ref_model(data)
    return data


def test_eval_mode_full_trunk_parity(ref_model, converted_params):
    """Production inference path: one stacked pass, eval BN."""
    ref_model.eval()
    im0, im1 = _images()
    data = _ref_forward(ref_model, im0, im1)

    cfg = tpu_cfg()
    corr, _ = compute_correspondences(
        converted_params, jnp.asarray(im0), jnp.asarray(im1), cfg, train=False
    )

    def chk(ours, ref_t, atol, name):
        np.testing.assert_allclose(
            np.asarray(ours), ref_t.numpy(), atol=atol, rtol=1e-3, err_msg=name
        )

    # (B, N, C) vs reference (B, C, N)
    chk(jnp.swapaxes(corr.kps0, 1, 2), data["kps0"], 2e-3, "kps0")  # pixels
    chk(jnp.swapaxes(corr.kps1, 1, 2), data["kps1"], 2e-3, "kps1")
    chk(jnp.swapaxes(corr.depth0, 1, 2), data["depth_kp0"], 1e-4, "depth0")
    chk(jnp.swapaxes(corr.depth1, 1, 2), data["depth_kp1"], 1e-4, "depth1")
    chk(jnp.swapaxes(corr.scr0, 1, 2), data["scr0"], 1e-5, "scr0")
    chk(jnp.swapaxes(corr.scr1, 1, 2), data["scr1"], 1e-5, "scr1")
    chk(jnp.swapaxes(corr.dsc0, 1, 2), data["dsc0"], 1e-4, "dsc0")
    chk(jnp.swapaxes(corr.dsc1, 1, 2), data["dsc1"], 1e-4, "dsc1")
    chk(corr.scores, data["scores"], 1e-5, "scores")
    chk(corr.kp_scores, data["kp_scores"], 1e-5, "kp_scores")
    chk(corr.final_scores, data["scores"] * data["kp_scores"], 1e-6, "final_scores")


def test_train_mode_composition_parity(ref_model, converted_params):
    """Train-mode BN parity with per-image head passes (see module docstring
    for why the stacked production path is exempt)."""
    ref_model.train()
    im0, im1 = _images(seed=6)
    data = _ref_forward(ref_model, im0, im1)
    ref_model.eval()

    cfg = tpu_cfg()
    df = cfg.MICKEY.DINOV2.DOWN_FACTOR

    outs = []
    for im in (im0, im1):
        fmap = backbone_features(converted_params, jnp.asarray(im), cfg)
        (kpts, depths, scores, descs), _ = heads_apply(
            converted_params, fmap, cfg, train=True
        )
        kpts = absolute_kpt_coordinates(kpts, df)
        n = kpts.shape[1] * kpts.shape[2]
        outs.append(
            (
                kpts.reshape(B, n, 2),
                depths.reshape(B, n, 1),
                scores.reshape(B, n, 1),
                descs.reshape(B, n, -1),
            )
        )
    (k0, d0, s0, c0), (k1, d1, s1, c1) = outs
    match = match_scores(converted_params["matcher"], c0, c1, cfg)
    kp_scores = jnp.einsum("bni,bmi->bnm", s0, s1)

    def chk(ours, ref_t, atol, name):
        np.testing.assert_allclose(
            np.asarray(ours), ref_t.numpy(), atol=atol, rtol=1e-3, err_msg=name
        )

    chk(jnp.swapaxes(k0, 1, 2), data["kps0"], 2e-3, "kps0")
    chk(jnp.swapaxes(d0, 1, 2), data["depth_kp0"], 1e-4, "depth0")
    chk(jnp.swapaxes(s1, 1, 2), data["scr1"], 1e-5, "scr1")
    chk(jnp.swapaxes(c1, 1, 2), data["dsc1"], 1e-4, "dsc1")
    chk(match, data["scores"], 1e-5, "scores")
    chk(kp_scores, data["kp_scores"], 1e-5, "kp_scores")
