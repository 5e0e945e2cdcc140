"""Flash-attention kernel parity (Pallas interpret mode on CPU).

Locks the online-softmax kernel (ops/flash_attention.py) against the plain
XLA reference for every block configuration the backbone can select via
cfg.TPU.ATTENTION_BLOCKS, including the production padding case (seq 1939
padded to 2048). The kernel's role mirrors the reference's xformers
memory-efficient attention (DINO_modules/layers/attention.py:65-81).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mickey_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention,
    multi_head_attention,
)


def _rand_qkv(b=1, h=2, s=512, d=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    return mk(), mk(), mk()


class TestFlashAttention:
    @pytest.mark.parametrize("block_q,block_k", [(256, 512), (512, 1024), (512, 2048)])
    def test_kernel_matches_reference(self, block_q, block_k):
        s = 2048  # production padded length (1939 tokens -> pad_to 512)
        seq_len = 1939
        q, k, v = _rand_qkv(s=s)
        ref = attention_reference(q, k, v, seq_len)
        out = flash_attention(q, k, v, seq_len, block_q=block_q, block_k=block_k,
                              interpret=True)
        np.testing.assert_allclose(
            np.asarray(out[:, :, :seq_len]), np.asarray(ref[:, :, :seq_len]),
            rtol=1e-5, atol=1e-5,
        )

    def test_no_padding(self):
        q, k, v = _rand_qkv(s=512)
        ref = attention_reference(q, k, v, 512)
        out = flash_attention(q, k, v, 512, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_bf16_matches_fp32_loosely(self):
        q, k, v = _rand_qkv(s=512)
        ref = attention_reference(q, k, v, 500)
        out = flash_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            500, interpret=True,
        ).astype(jnp.float32)
        assert np.max(np.abs(np.asarray(out[:, :, :500] - ref[:, :, :500]))) < 0.1

    def test_dispatch_falls_back_when_blocks_dont_divide(self, monkeypatch):
        # a 512-long sequence cannot use bk=2048: the dispatcher must fall
        # back to the proven 256/512 kernel rather than assert in pallas_call
        import mickey_tpu.ops.flash_attention as fa

        calls = []

        def spy(q, k, v, seq_len, block_q=256, block_k=512, interpret=False):
            calls.append((block_q, block_k))
            return fa.attention_reference(q, k, v, seq_len)

        monkeypatch.setattr(fa, "flash_attention", spy)
        q, k, v = _rand_qkv(s=512)
        out = fa.multi_head_attention(q, k, v, 512, use_pallas=True, blocks=(512, 2048))
        assert calls == [(256, 512)]
        ref = attention_reference(q, k, v, 512)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

        # and the 2048-padded production sequence selects the requested blocks
        calls.clear()
        q, k, v = _rand_qkv(s=2048, h=1)
        fa.multi_head_attention(q, k, v, 1939, use_pallas=True, blocks=(512, 2048))
        assert calls == [(512, 2048)]


class TestPackedFlashAttention:
    """Packed head-major kernel == unpacked reference on the same logits."""

    @pytest.mark.parametrize("block_q,block_k", [(256, 512), (512, 2048)])
    @pytest.mark.parametrize("h", [2, 4, 3])  # 3 = odd (a tp shard of vit_small)
    def test_packed_matches_reference(self, block_q, block_k, h):
        from mickey_tpu.ops.flash_attention import flash_attention_packed

        b, s, d, seq_len = 2, 2048, 64, 1939
        rng = np.random.default_rng(3)
        qkv = jnp.asarray(rng.normal(size=(b, s, h, 3, d)).astype(np.float32))
        out = flash_attention_packed(
            qkv.reshape(b, s, 3 * h * d), seq_len, h,
            block_q=block_q, block_k=block_k, interpret=True,
        )
        q, k, v = (jnp.moveaxis(qkv[:, :, :, i], 1, 2) for i in range(3))
        ref = attention_reference(q, k, v, seq_len)  # (B, H, S, D)
        ref = jnp.moveaxis(ref, 1, 2).reshape(b, s, h * d)
        np.testing.assert_allclose(
            np.asarray(out[:, :seq_len]), np.asarray(ref[:, :seq_len]),
            rtol=1e-5, atol=1e-5,
        )

    def test_dispatch_fallbacks(self):
        from mickey_tpu.ops.flash_attention import (
            multi_head_attention_packed,
            packed_kernel_blocks,
        )

        qkv = jnp.zeros((1, 500, 3 * 2 * 64), jnp.float32)  # seq not /512
        assert multi_head_attention_packed(qkv, 500, 2) is None
        qkv = jnp.zeros((1, 512, 3 * 2 * 32), jnp.float32)  # head_dim 32
        assert multi_head_attention_packed(qkv, 512, 2) is None
        # the static predicate agrees with the dispatcher
        assert packed_kernel_blocks(500, 64, True) is None
        assert packed_kernel_blocks(512, 32, True) is None
        assert packed_kernel_blocks(512, 64, False) is None
        assert packed_kernel_blocks(2048, 64, True, (512, 2048)) == (512, 2048)
        assert packed_kernel_blocks(512, 64, True, (512, 2048)) == (256, 512)
