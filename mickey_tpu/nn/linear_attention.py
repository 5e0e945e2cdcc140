"""Linear (ELU-kernel) self-attention transformer used inside the heads.

Counterpart of reference ``modules/att_layers/`` (LoFTR-style): 3-layer
self-attention at d_model=128 with 8 heads, O(N) linear attention
(``att_layers/attention.py:46-64``), LoFTR EncoderLayer wiring
(``att_layers/transformer_utils.py:40-66``) and optional 2-D sinusoidal
position encoding (``att_layers/transformer.py:10-43``).

Linear attention is already TPU-shaped — two einsums over (S, D, V) — so no
Pallas kernel is needed; XLA fuses the feature maps into the contractions.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .common import layernorm, layernorm_init, linear, linear_init

Params = Dict[str, Any]


def sine_position_encoding(d_model: int, h: int, w: int) -> np.ndarray:
    """2-D sinusoidal PE, (h, w, d_model), matching reference
    ``PositionEncodingSine`` (transformer.py:26-36) including its 1-based
    cumsum positions."""
    pe = np.zeros((d_model, h, w), dtype=np.float32)
    y_pos = np.cumsum(np.ones((h, w), np.float32), axis=0)[None]
    x_pos = np.cumsum(np.ones((h, w), np.float32), axis=1)[None]
    div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32) * (-math.log(10000.0) / (d_model // 2)))
    div = div[:, None, None]
    pe[0::4] = np.sin(x_pos * div)
    pe[1::4] = np.cos(x_pos * div)
    pe[2::4] = np.sin(y_pos * div)
    pe[3::4] = np.cos(y_pos * div)
    return np.transpose(pe, (1, 2, 0))  # (h, w, c)


def encoder_layer_init(key: jax.Array, d_model: int) -> Params:
    ks = jax.random.split(key, 6)
    return {
        "q_proj": linear_init(ks[0], d_model, d_model, bias=False, init="xavier"),
        "k_proj": linear_init(ks[1], d_model, d_model, bias=False, init="xavier"),
        "v_proj": linear_init(ks[2], d_model, d_model, bias=False, init="xavier"),
        "merge": linear_init(ks[3], d_model, d_model, bias=False, init="xavier"),
        "mlp_fc1": linear_init(ks[4], 2 * d_model, 2 * d_model, bias=False, init="xavier"),
        "mlp_fc2": linear_init(ks[5], 2 * d_model, d_model, bias=False, init="xavier"),
        "norm1": layernorm_init(d_model),
        "norm2": layernorm_init(d_model),
    }


def transformer_init(key: jax.Array, d_model: int = 128, num_layers: int = 3) -> Params:
    keys = jax.random.split(key, num_layers)
    layers = [encoder_layer_init(k, d_model) for k in keys]
    return {"layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers)}


def linear_attention(q, k, v, eps: float = 1e-6):
    """O(N) attention with elu+1 feature maps. q,k,v: (B, S, H, D)."""
    Q = jax.nn.elu(q) + 1.0
    K = jax.nn.elu(k) + 1.0
    v_length = v.shape[1]
    values = v / v_length  # fp16-overflow guard kept for parity (attention.py:59)
    KV = jnp.einsum("nshd,nshv->nhdv", K, values)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, jnp.sum(K, axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
    return out


def _encoder_layer_apply(lp: Params, x: jnp.ndarray, source: jnp.ndarray, nheads: int = 8):
    """LoFTR encoder layer (transformer_utils.py:40-66). x, source: (B, S, C)."""
    b, s, c = x.shape
    d = c // nheads
    q = linear(lp["q_proj"], x).reshape(b, -1, nheads, d)
    k = linear(lp["k_proj"], source).reshape(b, -1, nheads, d)
    v = linear(lp["v_proj"], source).reshape(b, -1, nheads, d)
    msg = linear_attention(q, k, v).reshape(b, s, c)
    msg = linear(lp["merge"], msg)
    msg = layernorm(lp["norm1"], msg)
    msg = linear(lp["mlp_fc1"], jnp.concatenate([x, msg], axis=-1))
    msg = jax.nn.relu(msg)
    msg = linear(lp["mlp_fc2"], msg)
    msg = layernorm(lp["norm2"], msg)
    return x + msg


def self_attention_transformer(
    params: Params, fmap: jnp.ndarray, add_pos_enc: bool = False
) -> jnp.ndarray:
    """Transformer_self_att counterpart. fmap: (B, H, W, C) -> (B, H, W, C)."""
    b, h, w, c = fmap.shape
    if add_pos_enc:
        pe = jnp.asarray(sine_position_encoding(c, h, w), dtype=fmap.dtype)
        fmap = fmap + pe[None]
    x = fmap.reshape(b, h * w, c)

    def body(carry, lp):
        return _encoder_layer_apply(lp, carry, carry), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x.reshape(b, h, w, c)


def full_attention(q, k, v):
    """O(N^2) softmax attention variant (att_layers/attention.py:23-44).
    q, k, v: (B, S, H, D)."""
    d = q.shape[-1]
    logits = jnp.einsum("nlhd,nshd->nlsh", q, k) / math.sqrt(d)
    probs = jax.nn.softmax(logits, axis=2)
    return jnp.einsum("nlsh,nshd->nlhd", probs, v)


def _encoder_layer_apply_full(lp: Params, x: jnp.ndarray, source: jnp.ndarray, nheads: int = 8):
    """EncoderLayer with full attention (attention='full' in the reference)."""
    b, s, c = x.shape
    d = c // nheads
    q = linear(lp["q_proj"], x).reshape(b, -1, nheads, d)
    k = linear(lp["k_proj"], source).reshape(b, -1, nheads, d)
    v = linear(lp["v_proj"], source).reshape(b, -1, nheads, d)
    msg = full_attention(q, k, v).reshape(b, s, c)
    msg = linear(lp["merge"], msg)
    msg = layernorm(lp["norm1"], msg)
    msg = linear(lp["mlp_fc1"], jnp.concatenate([x, msg], axis=-1))
    msg = jax.nn.relu(msg)
    msg = linear(lp["mlp_fc2"], msg)
    msg = layernorm(lp["norm2"], msg)
    return x + msg


def self_cross_transformer_init(key: jax.Array, d_model: int = 128, num_layers: int = 3) -> Params:
    """Transformer_att counterpart (transformer.py:105-172): alternating
    ['self', 'cross'] * num_layers layers."""
    keys = jax.random.split(key, 2 * num_layers)
    layers = [encoder_layer_init(k, d_model) for k in keys]
    return {"layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers)}


def self_cross_transformer(
    params: Params, fmap0: jnp.ndarray, fmap1: jnp.ndarray, add_pos_enc: bool = False
):
    """Alternating self/cross attention over two feature maps
    (Transformer_att.forward, transformer.py:135-172).
    fmap0/1: (B, H, W, C) -> same shapes."""
    b, h, w, c = fmap0.shape
    if add_pos_enc:
        pe = jnp.asarray(sine_position_encoding(c, h, w), dtype=fmap0.dtype)
        fmap0 = fmap0 + pe[None]
        fmap1 = fmap1 + pe[None]
    x0 = fmap0.reshape(b, h * w, c)
    x1 = fmap1.reshape(b, h * w, c)

    def body(carry, layer_and_idx):
        x0, x1 = carry
        lp, i = layer_and_idx
        is_self = i % 2 == 0

        def self_fn(args):
            a, b_ = args
            return (
                _encoder_layer_apply(lp, a, a),
                _encoder_layer_apply(lp, b_, b_),
            )

        def cross_fn(args):
            a, b_ = args
            return (
                _encoder_layer_apply(lp, a, b_),
                _encoder_layer_apply(lp, b_, a),
            )

        out = jax.lax.cond(is_self, self_fn, cross_fn, (x0, x1))
        return out, None

    n_layers = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    idxs = jnp.arange(n_layers)
    (x0, x1), _ = jax.lax.scan(body, (x0, x1), (params["layers"], idxs))
    return x0.reshape(b, h, w, c), x1.reshape(b, h, w, c)
