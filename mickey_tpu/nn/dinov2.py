"""DINOv2 Vision Transformer (functional JAX), TPU-native.

Re-implementation of the frozen DINOv2 backbone MicKey uses
(reference ``lib/models/MicKey/modules/DINO_modules/dinov2.py`` and
``layers/``): patch-14 ViT with LayerScale (init_values=1.0), pre-norm
blocks, exact-GELU MLP, learned pos-embed with bicubic interpolation to
arbitrary resolutions.

TPU design choices:
  * the 24 transformer blocks run as a single ``lax.scan`` over stacked
    parameters (one compiled block, 24x less HLO);
  * attention uses the Pallas flash kernel (ops/flash_attention.py) with the
    token sequence padded to a multiple of 512 and padded keys masked;
  * computation in bfloat16 (the TPU analog of the reference's fp16 autocast,
    ``mickey_extractor.py:31-35``), LayerNorm statistics in fp32;
  * pos-embed interpolation reproduces torch's ``F.interpolate(...,
    mode='bicubic')`` bit-for-bit via precomputed 1-D cubic-convolution
    matrices (a = -0.75, half-pixel centers, and the reference's ``+0.1``
    scale-factor fudge from ``dinov2.py:177-185``) so converted checkpoints
    are numerically faithful.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.flash_attention import (
    multi_head_attention,
    multi_head_attention_packed,
    packed_kernel_blocks,
)
from .common import layernorm, layernorm_init, linear, linear_init, trunc_normal
from .quant import maybe_linear

Params = Dict[str, Any]

VIT_CONFIGS = {
    "vit_small": dict(embed_dim=384, depth=12, num_heads=6),
    "vit_base": dict(embed_dim=768, depth=12, num_heads=12),
    "vit_large": dict(embed_dim=1024, depth=24, num_heads=16),
    "vit_giant2": dict(embed_dim=1536, depth=40, num_heads=24),
}


def swiglu_hidden_dim(dim: int, mlp_ratio: float = 4.0) -> int:
    """SwiGLUFFNFused hidden size (reference swiglu_ffn.py:56): 2/3 of the
    MLP hidden, rounded up to a multiple of 8."""
    return (int(dim * mlp_ratio * 2 / 3) + 7) // 8 * 8


def vit_init(
    key: jax.Array,
    variant: str = "vit_large",
    img_size: int = 518,
    patch_size: int = 14,
    in_chans: int = 3,
    mlp_ratio: float = 4.0,
    ffn_layer: str = "mlp",
) -> Params:
    """Random-init ViT params (same shapes as the torch state_dict converts to)."""
    c = VIT_CONFIGS[variant]
    dim, depth = c["embed_dim"], c["depth"]
    hidden = int(dim * mlp_ratio)
    n_patches = (img_size // patch_size) ** 2
    keys = jax.random.split(key, 8)

    def block_init(k):
        ks = jax.random.split(k, 4)
        if ffn_layer == "mlp":
            mlp = {
                "fc1": linear_init(ks[2], dim, hidden, init="trunc_normal"),
                "fc2": linear_init(ks[3], hidden, dim, init="trunc_normal"),
            }
        elif ffn_layer in ("swiglu", "swiglufused"):
            sh = swiglu_hidden_dim(dim, mlp_ratio)
            mlp = {
                "w12": linear_init(ks[2], dim, 2 * sh, init="trunc_normal"),
                "w3": linear_init(ks[3], sh, dim, init="trunc_normal"),
            }
        else:
            raise NotImplementedError(ffn_layer)
        return {
            "norm1": layernorm_init(dim),
            "attn": {
                "qkv": linear_init(ks[0], dim, 3 * dim, init="trunc_normal"),
                "proj": linear_init(ks[1], dim, dim, init="trunc_normal"),
            },
            "ls1": {"gamma": jnp.ones((dim,), jnp.float32)},
            "norm2": layernorm_init(dim),
            "mlp": mlp,
            "ls2": {"gamma": jnp.ones((dim,), jnp.float32)},
        }

    blocks = [block_init(k) for k in jax.random.split(keys[0], depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    return {
        "patch_embed": {
            "w": trunc_normal(keys[1], (patch_size, patch_size, in_chans, dim)),
            "b": jnp.zeros((dim,), jnp.float32),
        },
        "cls_token": 1e-6 * jax.random.normal(keys[2], (1, 1, dim), jnp.float32),
        "pos_embed": trunc_normal(keys[3], (1, n_patches + 1, dim)),
        "blocks": stacked,
        "norm": layernorm_init(dim),
    }


# -- torch-exact bicubic interpolation of the position embedding ---------------


def _torch_bicubic_matrix(n_src: int, n_dst: int, scale: float) -> np.ndarray:
    """1-D cubic-convolution interpolation matrix replicating torch bicubic.

    Maps a length-n_src signal to length-n_dst: out = M @ src.
    Half-pixel centers with the *given* scale factor (torch semantics when
    ``scale_factor`` is passed), Keys kernel a = -0.75, clamped borders.
    """
    a = -0.75

    def k(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x**3 - (a + 3) * x**2 + 1
        if x < 2:
            return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
        return 0.0

    M = np.zeros((n_dst, n_src), dtype=np.float64)
    for i in range(n_dst):
        x = (i + 0.5) / scale - 0.5
        x0 = math.floor(x)
        for tap in range(-1, 3):
            idx = min(max(x0 + tap, 0), n_src - 1)
            M[i, idx] += k(x - (x0 + tap))
    return M.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _pos_embed_matrices(n_side: int, h0: int, w0: int):
    """(W_h, W_w) resize matrices for a (n_side, n_side) grid -> (h0, w0).

    Includes the reference's ``+0.1`` anti-fp-error fudge (dinov2.py:179).
    """
    # NOTE: cache numpy (not jnp) — jnp constants created under a jit trace
    # would leak tracers through the lru_cache.
    Wh = _torch_bicubic_matrix(n_side, h0, (h0 + 0.1) / n_side)
    Ww = _torch_bicubic_matrix(n_side, w0, (w0 + 0.1) / n_side)
    return Wh, Ww


def interpolate_pos_encoding(pos_embed: jnp.ndarray, h0: int, w0: int) -> jnp.ndarray:
    """pos_embed (1, N+1, C) -> (1, h0*w0 + 1, C) via bicubic resize.

    Counterpart of reference ``dinov2.interpolate_pos_encoding`` (:165-189).
    """
    n = pos_embed.shape[1] - 1
    n_side = int(round(math.sqrt(n)))
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, n_side, n_side, -1).astype(jnp.float32)
    if (h0, w0) == (n_side, n_side):
        return pos_embed
    Wh, Ww = _pos_embed_matrices(n_side, h0, w0)
    out = jnp.einsum("hs,bstc->bhtc", jnp.asarray(Wh), patch_pe)
    out = jnp.einsum("wt,bhtc->bhwc", jnp.asarray(Ww), out)
    out = out.reshape(1, h0 * w0, -1)
    return jnp.concatenate([cls_pe, out.astype(pos_embed.dtype)], axis=1)


# -- forward -------------------------------------------------------------------


def _block_apply(x: jnp.ndarray, bp: Params, seq_len: int, use_pallas: bool, num_heads: int,
                 attn_blocks=(256, 512), mesh=None, packed: bool = True,
                 interpret: bool = False):
    """One pre-norm ViT block with LayerScale. x: (B, S, C).

    With a (data, model) mesh the block runs Megatron tensor-parallel: heads
    and MLP hidden features are sharded over 'model' (pinned with sharding
    constraints so GSPMD keeps the column/row pattern of
    parallel.vit_tp_shardings), and the attention kernel is shard_mapped so
    each device runs flash attention over its LOCAL heads — a Pallas call
    cannot be partitioned by GSPMD itself. The packed head-major kernel runs
    under TP too: head-major column shards of the fused qkv output are
    contiguous whole head groups, so each device's shard IS a valid packed
    (B, S, 3C/tp) array for its local heads.
    """
    from ..parallel import DATA_AXIS, MODEL_AXIS, mesh_tp

    b, s, c = x.shape
    d = c // num_heads
    tp = mesh_tp(mesh)
    if num_heads % tp != 0:
        raise ValueError(
            f"tensor-parallel size {tp} must divide num_heads={num_heads}"
        )

    def pin(t, *spec):
        if tp == 1:
            return t
        return jax.lax.with_sharding_constraint(
            t, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(*spec))
        )

    h = layernorm(bp["norm1"], x.astype(jnp.float32), eps=1e-6).astype(x.dtype)
    qkv = maybe_linear(bp["attn"]["qkv"], h)  # (B, S, 3C) — column-parallel
    # the fused qkv weight stores its 3C output dim HEAD-MAJOR (h, t, d) —
    # see checkpoint._qkv_to_head_major — so (a) the packed kernel can slice
    # heads straight out of the minor dim and (b) contiguous column shards
    # align with whole head groups under tensor parallelism
    attn = None
    if packed:
        if tp == 1:
            # packed path: attention directly on the linear output, no
            # (B,S,H,D)<->(B,H,S,D) relayouts
            attn = multi_head_attention_packed(
                qkv, seq_len, num_heads, use_pallas=use_pallas, blocks=attn_blocks,
                interpret=interpret,
            )
        elif packed_kernel_blocks(s, d, use_pallas, attn_blocks) is not None:
            cspec = jax.sharding.PartitionSpec(DATA_AXIS, None, MODEL_AXIS)

            def _packed_local(qkv_local):
                out = multi_head_attention_packed(
                    qkv_local, seq_len, num_heads // tp, use_pallas=use_pallas,
                    blocks=attn_blocks, interpret=interpret,
                )
                assert out is not None  # eligibility pre-checked above
                return out

            attn = jax.shard_map(
                _packed_local, mesh=mesh, in_specs=(cspec,), out_specs=cspec,
                check_vma=False,
            )(pin(qkv, DATA_AXIS, None, MODEL_AXIS))
    if attn is None:
        qkv5 = pin(qkv.reshape(b, s, num_heads, 3, d), DATA_AXIS, None, MODEL_AXIS, None, None)
        q, k, v = (jnp.moveaxis(qkv5[:, :, :, i], 1, 2) for i in range(3))  # (B, H, S, D)
        if tp > 1:
            hspec = jax.sharding.PartitionSpec(DATA_AXIS, MODEL_AXIS, None, None)
            attn = jax.shard_map(
                functools.partial(
                    multi_head_attention, seq_len=seq_len, use_pallas=use_pallas,
                    blocks=attn_blocks, interpret=interpret,
                ),
                mesh=mesh, in_specs=(hspec, hspec, hspec), out_specs=hspec, check_vma=False,
            )(q, k, v)
        else:
            attn = multi_head_attention(q, k, v, seq_len, use_pallas=use_pallas,
                                        blocks=attn_blocks, interpret=interpret)
        attn = jnp.moveaxis(attn, 1, 2).reshape(b, s, c)
    attn = pin(maybe_linear(bp["attn"]["proj"], attn), DATA_AXIS, None, None)  # row-parallel
    x = x + bp["ls1"]["gamma"].astype(x.dtype) * attn

    h = layernorm(bp["norm2"], x.astype(jnp.float32), eps=1e-6).astype(x.dtype)
    if "fc1" in bp["mlp"]:
        h = pin(maybe_linear(bp["mlp"]["fc1"], h), DATA_AXIS, None, MODEL_AXIS)
        h = jax.nn.gelu(h, approximate=False)
        h = pin(maybe_linear(bp["mlp"]["fc2"], h), DATA_AXIS, None, None)
    else:  # SwiGLU FFN (swiglu_ffn.py:29-33) — replicated under tp
        h12 = maybe_linear(bp["mlp"]["w12"], h)
        h1, h2 = jnp.split(h12, 2, axis=-1)
        h = maybe_linear(bp["mlp"]["w3"], jax.nn.silu(h1) * h2)
    x = x + bp["ls2"]["gamma"].astype(x.dtype) * h
    return x


def vit_forward_features(
    params: Params,
    images: jnp.ndarray,
    patch_size: int = 14,
    num_heads: int = 16,
    dtype: jnp.dtype = jnp.bfloat16,
    use_pallas: bool = True,
    pad_to: int = 512,
    attn_blocks=(256, 512),
    scan_unroll: int = 1,
    mesh=None,
    packed: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Frozen-backbone feature extraction.

    images: (B, H, W, 3), H and W multiples of patch_size, float in [0, 1]
    (the reference feeds /255-normalized RGB directly, datasets/utils.py:75).
    Returns x_norm_patchtokens: (B, H/14 * W/14, C) in float32, row-major over
    the (H/14, W/14) grid — matching reference ``forward_features``
    (dinov2.py:221-236).
    """
    b, h, w, _ = images.shape
    h0, w0 = h // patch_size, w // patch_size

    # patchify as reshape + einsum: the identical contraction to the
    # reference's stride-14 conv, expressed so it lowers to an MXU matmul by
    # construction instead of relying on XLA's conv lowering. Same-process
    # A/B on v5e measured parity with the conv (tools/bench_backbone_profile
    # round 3: conv 48.0 / einsum 50.6 / flat matmul 49.9 ms standalone, all
    # ~RTT-dominated; full backbone 296.4 conv vs 292.8 einsum — noise), so
    # this is a lowering-robustness choice, not a measured win.
    x = images.astype(dtype).reshape(b, h0, patch_size, w0, patch_size, images.shape[-1])
    x = jnp.einsum("bipjqc,pqcd->bijd", x, params["patch_embed"]["w"].astype(dtype))
    x = x + params["patch_embed"]["b"].astype(dtype)
    x = x.reshape(b, h0 * w0, -1)

    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    pe = interpolate_pos_encoding(params["pos_embed"], h0, w0)
    x = x + pe.astype(dtype)

    seq_len = x.shape[1]
    if use_pallas:
        padded = -(-seq_len // pad_to) * pad_to
        if padded != seq_len:
            x = jnp.pad(x, ((0, 0), (0, padded - seq_len), (0, 0)))

    def body(carry, bp):
        return _block_apply(carry, bp, seq_len, use_pallas, num_heads, attn_blocks,
                            mesh, packed, interpret), None

    x, _ = jax.lax.scan(body, x, params["blocks"], unroll=scan_unroll)

    x = x[:, :seq_len]
    x = layernorm(params["norm"], x.astype(jnp.float32), eps=1e-6)
    return x[:, 1:]  # drop cls token -> patch tokens, float32


def vit_features_chw(params, images_nhwc, cfg_dtype="bfloat16", use_pallas=True, num_heads=16, patch_size=14,
                     attn_blocks=(256, 512), scan_unroll=1, mesh=None, packed=True,
                     interpret=False):
    """Patch tokens reshaped to a (B, H/14, W/14, C) feature map (fp32).

    The frozen-backbone boundary: output is wrapped in stop_gradient, the
    TPU-native equivalent of the reference's ``torch.no_grad()`` +
    ``.float()`` (mickey_extractor.py:48-51).
    """
    dtype = jnp.bfloat16 if cfg_dtype in ("bfloat16", "float16", True) else jnp.float32
    b, h, w, _ = images_nhwc.shape
    toks = vit_forward_features(
        params, images_nhwc, patch_size=patch_size, num_heads=num_heads,
        dtype=dtype, use_pallas=use_pallas, attn_blocks=attn_blocks,
        scan_unroll=scan_unroll, mesh=mesh, packed=packed, interpret=interpret,
    )
    fmap = toks.reshape(b, h // patch_size, w // patch_size, -1)
    return jax.lax.stop_gradient(fmap)
