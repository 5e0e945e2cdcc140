"""MicKey keypoint heads: score / offset / depth / descriptor.

Counterparts of reference ``modules/mickey_extractor.py:67-251`` and the
pre-activation ResNet block (``modules/utils/extractor_utils.py:12-35``).
Each head: 4 BasicBlocks (1024 -> 512 -> 256 -> 128 -> 64|128) with a 3-layer
linear-attention transformer before the last block, then a 1x1 projection.

TPU design: NHWC activations, fp32 parameters with configurable conv compute
dtype; BatchNorm threads explicit running-stat state (functional), with
optional cross-mesh stat sync.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .common import batchnorm, batchnorm_init, conv2d, conv2d_init
from .linear_attention import self_attention_transformer, transformer_init

Params = Dict[str, Any]


# -- BasicBlock -----------------------------------------------------------------


def basic_block_init(key, cin: int, cout: int, bn: bool = True) -> Params:
    ks = jax.random.split(key, 3)
    p: Params = {
        "conv1": conv2d_init(ks[0], cin, cout, 3),
        "conv2": conv2d_init(ks[1], cout, cout, 3),
    }
    if bn:
        p["bn1"] = batchnorm_init(cout)
        p["bn2"] = batchnorm_init(cout)
    if cin != cout:
        p["shortcut"] = conv2d_init(ks[2], cin, cout, 1)
    return p


def heads_conv_dtype(cfg):
    """bf16 conv compute for the heads (fp32 accumulation; BN, residual adds
    and head outputs stay fp32). Default OFF: XLA already lowers fp32 convs
    to single-pass bf16 MXU dots at default precision, so explicit rounding
    only adds casts (measured slightly slower, BENCHLOG round 3). CPU keeps
    fp32 so golden-parity tests bind bit-tight; HEADS_BF16_ON_CPU lets tests
    exercise the rounding path."""
    if not bool(cfg.TPU.get("HEADS_BF16", False)):
        return None
    if jax.default_backend() == "cpu" and not bool(cfg.TPU.get("HEADS_BF16_ON_CPU", False)):
        return None
    return jnp.bfloat16


def basic_block_apply(
    p: Params, x: jnp.ndarray, relu: bool = True, train: bool = False, axis_name=None,
    compute_dtype=None,
) -> Tuple[jnp.ndarray, Params]:
    """Pre-activation-style block (extractor_utils.py:28-35):
    out = [relu](bn2(conv2(relu(bn1(conv1(x))))) + shortcut(x))."""
    new_p = dict(p)
    shortcut = conv2d(p["shortcut"], x, compute_dtype=compute_dtype) if "shortcut" in p else x
    out = conv2d(p["conv1"], x, compute_dtype=compute_dtype)
    if "bn1" in p:
        out, new_p["bn1"] = batchnorm(p["bn1"], out, train=train, axis_name=axis_name)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, compute_dtype=compute_dtype)
    if "bn2" in p:
        out, new_p["bn2"] = batchnorm(p["bn2"], out, train=train, axis_name=axis_name)
    out = out + shortcut
    if relu:
        out = jax.nn.relu(out)
    return out, new_p


# -- shared head trunk -----------------------------------------------------------


def _head_init(key, in_channels: int, block_dims, last_dim: int, bn: bool, out_channels: int) -> Params:
    ks = jax.random.split(key, 6)
    dims = [in_channels] + list(block_dims[:3]) + [last_dim]
    return {
        "resblock1": basic_block_init(ks[0], dims[0], dims[1], bn),
        "resblock2": basic_block_init(ks[1], dims[1], dims[2], bn),
        "resblock3": basic_block_init(ks[2], dims[2], dims[3], bn),
        "resblock4": basic_block_init(ks[3], dims[3], dims[4], bn),
        "att": transformer_init(ks[4], d_model=block_dims[2]),
        "out": conv2d_init(ks[5], dims[4], out_channels, 1) if out_channels else None,
    }


def _head_trunk(
    p: Params, fmap: jnp.ndarray, add_pos_enc: bool, last_relu: bool, train: bool, axis_name,
    compute_dtype=None,
) -> Tuple[jnp.ndarray, Params]:
    new_p = dict(p)
    cd = compute_dtype
    x, new_p["resblock1"] = basic_block_apply(p["resblock1"], fmap, train=train, axis_name=axis_name, compute_dtype=cd)
    x, new_p["resblock2"] = basic_block_apply(p["resblock2"], x, train=train, axis_name=axis_name, compute_dtype=cd)
    x, new_p["resblock3"] = basic_block_apply(p["resblock3"], x, train=train, axis_name=axis_name, compute_dtype=cd)
    x = self_attention_transformer(p["att"], x, add_pos_enc=add_pos_enc)
    x, new_p["resblock4"] = basic_block_apply(
        p["resblock4"], x, relu=last_relu, train=train, axis_name=axis_name, compute_dtype=cd
    )
    return x, new_p


# -- detection (score) head --------------------------------------------------------


def det_head_init(key, cfg) -> Params:
    mk = cfg.MICKEY
    return _head_init(key, mk.DINOV2.CHANNEL_DIM, mk.KP_HEADS.BLOCKS_DIM, mk.KP_HEADS.BLOCKS_DIM[3], mk.KP_HEADS.BN, 1)


def remove_borders(score_map: jnp.ndarray, borders: int) -> jnp.ndarray:
    """Zero a `borders`-cell frame of the (B, H, W, 1) map
    (mickey_extractor.py:98-110)."""
    b, h, w, c = score_map.shape
    row = jnp.arange(h)
    col = jnp.arange(w)
    keep = ((row >= borders) & (row < h - borders))[:, None] & (
        (col >= borders) & (col < w - borders)
    )[None, :]
    return score_map * keep[None, :, :, None].astype(score_map.dtype)


def det_head_apply(p: Params, fmap, cfg, train=False, axis_name=None):
    """Score map (B, H, W, 1), image-wide tempered softmax with 3-cell border
    masking (mickey_extractor.py:112-142)."""
    mk = cfg.MICKEY
    x, new_p = _head_trunk(p, fmap, mk.KP_HEADS.POS_ENCODING, True, train, axis_name,
                           compute_dtype=heads_conv_dtype(cfg))
    scores = conv2d(p["out"], x)
    b = scores.shape[0]
    eps = 1e-16
    if mk.KP_HEADS.USE_SOFTMAX:
        tmp_softmax = 100.0
        mean = jax.lax.stop_gradient(jnp.mean(scores.reshape(b, -1), axis=-1) + eps)
        scores = scores - mean.reshape(b, 1, 1, 1)
        exp_scores = jnp.exp(scores / tmp_softmax)
        exp_scores = remove_borders(exp_scores, 3)
        denom = jnp.sum(exp_scores.reshape(b, -1), axis=-1).reshape(b, 1, 1, 1)
        scores = exp_scores / (denom + eps)
    else:
        scores = remove_borders(jax.nn.sigmoid(scores), 3)
    return scores, new_p


# -- offset head --------------------------------------------------------------------


def offset_head_init(key, cfg) -> Params:
    mk = cfg.MICKEY
    return _head_init(key, mk.DINOV2.CHANNEL_DIM, mk.KP_HEADS.BLOCKS_DIM, mk.KP_HEADS.BLOCKS_DIM[3], mk.KP_HEADS.BN, 2)


def offset_head_apply(p: Params, fmap, cfg, train=False, axis_name=None):
    """Sigmoid xy offset in [0, 1] patch units, (B, H, W, 2)
    (mickey_extractor.py:164-178)."""
    mk = cfg.MICKEY
    x, new_p = _head_trunk(p, fmap, mk.KP_HEADS.POS_ENCODING, True, train, axis_name,
                           compute_dtype=heads_conv_dtype(cfg))
    return jax.nn.sigmoid(conv2d(p["out"], x)), new_p


# -- depth head ----------------------------------------------------------------------


def depth_head_init(key, cfg) -> Params:
    mk = cfg.MICKEY
    return _head_init(key, mk.DINOV2.CHANNEL_DIM, mk.KP_HEADS.BLOCKS_DIM, mk.KP_HEADS.BLOCKS_DIM[3], mk.KP_HEADS.BN, 1)


def depth_head_apply(p: Params, fmap, cfg, train=False, axis_name=None):
    """Metric depth map (B, H, W, 1) (mickey_extractor.py:203-218)."""
    mk = cfg.MICKEY
    x, new_p = _head_trunk(p, fmap, mk.KP_HEADS.POS_ENCODING, True, train, axis_name,
                           compute_dtype=heads_conv_dtype(cfg))
    depths = conv2d(p["out"], x)
    if mk.KP_HEADS.USE_DEPTHSIGMOID:
        depths = mk.KP_HEADS.MAX_DEPTH * jax.nn.sigmoid(depths)
    return depths, new_p


# -- descriptor head -------------------------------------------------------------------


def desc_head_init(key, cfg) -> Params:
    mk = cfg.MICKEY
    return _head_init(
        key, mk.DINOV2.CHANNEL_DIM, mk.KP_HEADS.BLOCKS_DIM, mk.DSC_HEAD.LAST_DIM, mk.KP_HEADS.BN, 0
    )


def desc_head_apply(p: Params, fmap, cfg, train=False, axis_name=None):
    """L2-normalized descriptors (B, H, W, 128); final block without ReLU
    (mickey_extractor.py:240-251)."""
    mk = cfg.MICKEY
    x, new_p = _head_trunk(p, fmap, mk.DSC_HEAD.POS_ENCODING, False, train, axis_name,
                           compute_dtype=heads_conv_dtype(cfg))
    if mk.DSC_HEAD.NORM_DSC:
        x = x / jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-10)
    return x, new_p
