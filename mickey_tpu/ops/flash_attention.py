"""Pallas TPU flash attention (forward) for the frozen DINOv2 backbone.

The reference runs DINOv2 ViT-L/14 under xformers memory-efficient attention
(reference ``DINO_modules/layers/attention.py:65-81``).  The TPU-native
equivalent is an online-softmax (flash) kernel: the (S, S) score matrix never
touches HBM — each query block streams key/value blocks through VMEM and
keeps running max/denominator statistics.

Backbone-only (frozen, no backward pass needed): MicKey never backprops
through DINOv2 (reference ``mickey_extractor.py:48-51`` wraps it in no_grad);
callers wrap activations in ``stop_gradient``.

Shapes: q, k, v are (B, H, S, D) with S a multiple of the block size; real
sequence length ``seq_len <= S`` is baked in statically and padded keys are
masked with -inf logits.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _online_softmax_attend(q, load_kv, num_kb: int, block_k: int, seq_len: int, scale: float):
    """The flash inner loop, shared by the classic and packed kernels.

    q: (block_q, D) in its STORED dtype. load_kv(i) -> (k, v) (block_k, D),
    also stored dtype, for key-block i. The QK / PV matmuls run on the MXU in
    the stored dtype with fp32 accumulation: for bf16 inputs this is
    bit-identical to upcasting first (8-bit mantissa products are exact in
    fp32) on the QK side and ~4x faster than fp32-emulated matmuls; the
    softmax probabilities are quantized to the value dtype for the PV matmul
    (<=0.4% relative — inside the backbone's bf16 envelope). Softmax
    statistics and the accumulator stay fp32. ``scale`` (1/sqrt(D)) is
    applied to the fp32 scores, not to q, so low-precision q is not
    pre-rounded. Streams key/value blocks keeping running max / denominator;
    positions >= seq_len are masked. Returns the normalized (block_q, D)
    fp32 attention output.
    """
    block_q, d = q.shape

    def body(i, carry):
        acc, m, l = carry
        k, v = load_kv(i)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bq, Bk) fp32
        # mask padded keys (static seq_len)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + i * block_k
        s = jnp.where(col < seq_len, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    return acc / jnp.maximum(l, 1e-30)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int, block_k: int):
    """One (batch*head, q-block) program: stream K/V blocks with online softmax."""
    q = q_ref[0]  # (Bq, D), stored dtype — MXU dot with fp32 accumulation
    num_kb = k_ref.shape[1] // block_k

    def load_kv(i):
        return (
            k_ref[0, pl.ds(i * block_k, block_k), :],
            v_ref[0, pl.ds(i * block_k, block_k), :],
        )

    out = _online_softmax_attend(q, load_kv, num_kb, block_k, seq_len, scale)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_len", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    seq_len: int,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Non-causal multi-head attention: softmax(q k^T / sqrt(D)) v.

    q, k, v: (B, H, S, D), S % block == 0; positions >= seq_len are padding.
    Returns (B, H, S, D) in q.dtype (padded rows contain garbage).
    """
    b, h, s, d = q.shape
    assert s % block_q == 0 and s % block_k == 0, (s, block_q, block_k)
    scale = 1.0 / math.sqrt(d)
    bh = b * h
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)

    grid = (bh, s // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, seq_len=seq_len, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * d, bytes_accessed=4 * bh * s * d * 4, transcendentals=bh * s * s
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, s, d)


def _flash_packed_kernel(
    qkvq_ref, qkvs_ref, o_ref, *, scale: float, seq_len: int, block_k: int,
    head_dim: int, heads_per_block: int,
):
    """One (batch, head-pair, q-block) program on PACKED head-major qkv.

    qkvq_ref: (1, block_q, hpb*3*D) — this q-block's packed q|k|v columns for
    the program's head group; qkvs_ref: (1, S, hpb*3*D) — the full sequence
    (for K/V). Slicing q/k/v out of the packed minor dim replaces the four
    (B,S,H,D)<->(B,H,S,D) relayouts XLA otherwise materializes per block.
    """
    hd = head_dim
    num_kb = qkvs_ref.shape[1] // block_k
    for j in range(heads_per_block):  # python-unrolled: static slices
        base = j * 3 * hd
        q = qkvq_ref[0, :, base : base + hd]  # stored dtype (bf16 in prod)

        def load_kv(i, base=base):
            return (
                qkvs_ref[0, pl.ds(i * block_k, block_k), base + hd : base + 2 * hd],
                qkvs_ref[0, pl.ds(i * block_k, block_k), base + 2 * hd : base + 3 * hd],
            )

        out = _online_softmax_attend(q, load_kv, num_kb, block_k, seq_len, scale)
        o_ref[0, :, j * hd : (j + 1) * hd] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("seq_len", "num_heads", "block_q", "block_k", "interpret")
)
def flash_attention_packed(
    qkv: jnp.ndarray,  # (B, S, 3C) packed HEAD-MAJOR: minor dim = (H, 3, D)
    seq_len: int,
    num_heads: int,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention directly on the head-major packed qkv linear output.

    Returns (B, S, C) in the standard head-concat layout the proj weight
    expects. Processes TWO heads per program so the packed minor block
    (2*3*D = 384 for D=64) and output block (128) satisfy TPU lane tiling —
    no (B,S,H,D)->(B,H,S,D) relayouts anywhere. ODD head counts (e.g. a
    tensor-parallel shard of vit_small's 6 heads at tp=2) fall back to one
    program per (batch, q-block) covering ALL heads: full-minor blocks are
    exempt from the 128-lane divisibility rule.
    """
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hpb = 2 if num_heads % 2 == 0 else num_heads  # heads per program
    assert s % block_q == 0 and s % block_k == 0, (num_heads, s)
    scale = 1.0 / math.sqrt(d)
    grid = (b, num_heads // hpb, s // block_q)

    out = pl.pallas_call(
        functools.partial(
            _flash_packed_kernel, scale=scale, seq_len=seq_len, block_k=block_k,
            head_dim=d, heads_per_block=hpb,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, hpb * 3 * d), lambda bi, hp, qi: (bi, qi, hp),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, hpb * 3 * d), lambda bi, hp, qi: (bi, 0, hp),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, hpb * d), lambda bi, hp, qi: (bi, qi, hp),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s * s * d,
            bytes_accessed=2 * b * s * (c3 + c) * 2,
            transcendentals=b * num_heads * s * s,
        ),
        interpret=interpret,
    )(qkv, qkv)
    return out


def attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """Plain-XLA attention with identical masking semantics (CPU/testing path)."""
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    mask = jnp.arange(s) < seq_len
    logits = jnp.where(mask[None, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def multi_head_attention_packed(qkv, seq_len: int, num_heads: int,
                                use_pallas: bool = True, blocks=(256, 512),
                                interpret: bool = False):
    """Packed head-major (B, S, 3C) -> (B, S, C), or None when no kernel
    path applies (CPU, head_dim not 64-aligned, or sequence not
    block-divisible) — callers then take the unpacked reshape path."""
    b, s, c3 = qkv.shape
    d = (c3 // 3) // num_heads
    sel = packed_kernel_blocks(s, d, use_pallas, blocks)
    if sel is None:
        return None
    bq, bk = sel
    return flash_attention_packed(qkv, seq_len, num_heads, block_q=bq, block_k=bk,
                                  interpret=interpret)


def packed_kernel_blocks(s: int, head_dim: int, use_pallas: bool, blocks=(256, 512)):
    """Static eligibility for the packed kernel: the (block_q, block_k) it
    would use, or None when the unpacked path must be taken."""
    if not use_pallas or head_dim % 64:
        return None
    bq, bk = blocks
    if s % bq == 0 and s % bk == 0:
        return bq, bk
    if s % 512 == 0:
        return 256, 512
    return None


def multi_head_attention(q, k, v, seq_len: int, use_pallas: bool = True,
                         blocks=(256, 512), interpret: bool = False):
    """Dispatch to the Pallas kernel on TPU, XLA reference elsewhere.

    ``blocks`` = (block_q, block_k); configurable via cfg.TPU.ATTENTION_BLOCKS.
    bq512/bk2048 measures faster standalone (BENCHLOG.md) but historically the
    backbone program containing it could not compile through the flaky
    remote-compile service; the staged pipeline re-tests it per round.
    """
    bq, bk = blocks
    if use_pallas and q.shape[2] % bq == 0 and q.shape[2] % bk == 0:
        return flash_attention(q, k, v, seq_len, block_q=bq, block_k=bk, interpret=interpret)
    if use_pallas and q.shape[2] % 512 == 0:
        return flash_attention(q, k, v, seq_len, block_q=256, block_k=512, interpret=interpret)
    return attention_reference(q, k, v, seq_len)
