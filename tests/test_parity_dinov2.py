"""Golden parity: JAX DINOv2 backbone vs the reference torch implementation.

Uses vit_small (same code path as vit_large: patch embed, interpolated pos
encoding, pre-norm blocks with LayerScale, exact GELU) with random weights
converted through the checkpoint converter.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mickey_tpu.nn.dinov2 import (  # noqa: E402
    interpolate_pos_encoding,
    vit_forward_features,
)
from mickey_tpu.training.checkpoint import convert_dinov2_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def ref_vit():
    from lib.models.MicKey.modules.DINO_modules.dinov2 import vit_small

    torch.manual_seed(0)
    model = vit_small(
        img_size=518, patch_size=14, init_values=1.0, ffn_layer="mlp", block_chunks=0
    ).eval()
    # re-randomize: vit init zeroes cls/pos embeddings; give them real values
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        model.pos_embed.copy_(0.02 * torch.randn(model.pos_embed.shape, generator=g))
        model.cls_token.copy_(0.02 * torch.randn(model.cls_token.shape, generator=g))
    return model


@pytest.fixture(autouse=True)
def _highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


def test_pos_embed_interpolation_matches_torch(ref_vit):
    """Our cubic-matrix interpolation vs torch F.interpolate bicubic."""
    h, w = 70, 56  # -> 5x4 patch grid
    x_dummy = torch.zeros(1, (h // 14) * (w // 14) + 1, 384)
    with torch.no_grad():
        ref = ref_vit.interpolate_pos_encoding(x_dummy, h, w).numpy()
    ours = np.asarray(
        interpolate_pos_encoding(jnp.asarray(ref_vit.pos_embed.detach().numpy()), h // 14, w // 14)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("hw", [(70, 56), (112, 140)])
def test_patch_tokens_parity(ref_vit, hw):
    h, w = hw
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (2, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        ref = ref_vit.forward_features(torch.from_numpy(img))["x_norm_patchtokens"].numpy()

    params = convert_dinov2_state_dict(ref_vit.state_dict(), depth=12)
    ours = vit_forward_features(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        num_heads=6,
        dtype=jnp.float32,
        use_pallas=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_bf16_backbone_close_to_fp32(ref_vit):
    """bf16 compute should stay within feature-level drift tolerances."""
    h, w = 70, 56
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    params = jax.tree.map(jnp.asarray, convert_dinov2_state_dict(ref_vit.state_dict(), depth=12))
    f32 = np.asarray(vit_forward_features(params, jnp.asarray(img), num_heads=6, dtype=jnp.float32, use_pallas=False))
    bf16 = np.asarray(vit_forward_features(params, jnp.asarray(img), num_heads=6, dtype=jnp.bfloat16, use_pallas=False))
    # relative drift of normalized features
    denom = np.abs(f32).mean()
    assert np.abs(bf16 - f32).mean() / denom < 0.05


def test_swiglu_ffn_parity():
    """SwiGLU FFN variant matches the reference (vit_small, ffn_layer=swiglufused)."""
    from lib.models.MicKey.modules.DINO_modules.dinov2 import vit_small

    from mickey_tpu.nn.dinov2 import vit_forward_features as fwd

    torch.manual_seed(5)
    model = vit_small(
        img_size=518, patch_size=14, init_values=1.0, ffn_layer="swiglufused", block_chunks=0
    ).eval()
    g = torch.Generator().manual_seed(6)
    with torch.no_grad():
        model.pos_embed.copy_(0.02 * torch.randn(model.pos_embed.shape, generator=g))

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (1, 3, 70, 56)).astype(np.float32)
    with torch.no_grad():
        ref = model.forward_features(torch.from_numpy(img))["x_norm_patchtokens"].numpy()
    params = convert_dinov2_state_dict(model.state_dict(), depth=12)
    with jax.default_matmul_precision("highest"):
        ours = fwd(
            jax.tree.map(jnp.asarray, params),
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            num_heads=6,
            dtype=jnp.float32,
            use_pallas=False,
        )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)
