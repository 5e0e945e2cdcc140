"""Functional NN primitives (pytree params + pure apply functions).

mickey-tpu models are plain pytrees of jnp arrays with explicit apply
functions — no module framework. This keeps jit/pjit boundaries obvious,
makes checkpoint conversion from the reference's torch state_dicts a direct
tree mapping, and lets every parameter be sharded with jax.sharding
annotations.

Conventions:
  * Activations are NHWC (TPU-native conv layout); torch reference is NCHW.
  * Conv weights are HWIO; torch's OIHW converts via transpose(2, 3, 1, 0).
  * Linear weights are stored (in, out); torch's (out, in) converts via .T.
  * Initializers mirror torch defaults (kaiming-uniform for conv/linear,
    U(-1/sqrt(fan_in), ..) biases) so from-scratch training matches the
    reference's dynamics.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# -- initializers --------------------------------------------------------------


def _kaiming_uniform_conv(key, shape_hwio, a: float = math.sqrt(5)):
    """torch.nn.Conv2d default weight init (kaiming_uniform, a=sqrt(5))."""
    kh, kw, cin, cout = shape_hwio
    fan_in = kh * kw * cin
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape_hwio, jnp.float32, -bound, bound)


def _kaiming_uniform_linear(key, shape_io, a: float = math.sqrt(5)):
    cin, cout = shape_io
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / cin)
    return jax.random.uniform(key, shape_io, jnp.float32, -bound, bound)


def xavier_uniform(key, shape_io):
    cin, cout = shape_io
    bound = math.sqrt(6.0 / (cin + cout))
    return jax.random.uniform(key, shape_io, jnp.float32, -bound, bound)


def trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


# -- conv ----------------------------------------------------------------------


def conv2d_init(key, cin: int, cout: int, ksize: int, bias: bool = False) -> Params:
    kw, kb = jax.random.split(key)
    p = {"w": _kaiming_uniform_conv(kw, (ksize, ksize, cin, cout))}
    if bias:
        fan_in = ksize * ksize * cin
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def conv2d(
    p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME", compute_dtype=None
) -> jnp.ndarray:
    """x: (B, H, W, Cin) -> (B, H', W', Cout).

    ``compute_dtype`` (e.g. bfloat16) rounds ONLY the matmul inputs; the MXU
    accumulates fp32 and the output returns in x.dtype. fp32 convs on TPU are
    MXU-emulated at ~1/3 rate, so single-pass bf16 with fp32 accumulation is
    the fast path (heads measured ~44 TF/s fp32, BENCHLOG round 2)."""
    if compute_dtype is not None and x.dtype != compute_dtype:
        out = jax.lax.conv_general_dilated(
            x.astype(compute_dtype),
            p["w"].astype(compute_dtype),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
    else:
        out = jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


# -- batchnorm -----------------------------------------------------------------


def batchnorm_init(c: int) -> Params:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def batchnorm(
    p: Params,
    x: jnp.ndarray,
    train: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm over all but the channel (last) axis.

    Matches torch.nn.BatchNorm2d semantics: biased variance for
    normalization, unbiased variance in the running estimate, running stats
    EMA with the given momentum. When ``axis_name`` is set, batch statistics
    are additionally averaged across that mesh axis (sync-BN over the
    data-parallel mesh — the TPU equivalent of stats staying per-replica
    under DDP is axis_name=None).
    Returns (out, new_state) — new_state == p when train=False.
    """
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x, axis=reduce_axes)
        mean2 = jnp.mean(jnp.square(x), axis=reduce_axes)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean2 = jax.lax.pmean(mean2, axis_name)
        var = mean2 - jnp.square(mean)
        n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_p = dict(p)
        new_p["mean"] = (1 - momentum) * p["mean"] + momentum * mean.astype(jnp.float32)
        new_p["var"] = (1 - momentum) * p["var"] + momentum * unbiased.astype(jnp.float32)
    else:
        mean, var = p["mean"], p["var"]
        new_p = p
    inv = jax.lax.rsqrt(var.astype(x.dtype) + eps) * p["scale"].astype(x.dtype)
    out = (x - mean.astype(x.dtype)) * inv + p["bias"].astype(x.dtype)
    return out, new_p


# -- layernorm -----------------------------------------------------------------


def layernorm_init(c: int) -> Params:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    return out * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


# -- linear --------------------------------------------------------------------


def linear_init(key, cin: int, cout: int, bias: bool = True, init: str = "kaiming") -> Params:
    kw, kb = jax.random.split(key)
    if init == "kaiming":
        w = _kaiming_uniform_linear(kw, (cin, cout))
    elif init == "xavier":
        w = xavier_uniform(kw, (cin, cout))
    elif init == "trunc_normal":
        w = trunc_normal(kw, (cin, cout))
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(cin)
        p["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    out = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-10) -> jnp.ndarray:
    """Reference ``desc_l2norm`` (extractor_utils.py:6-10): x / sqrt(sum x^2 + eps)."""
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
