"""Int8 PTQ backbone experiment (nn/quant.py) — CPU parity gates.

The backbone is FROZEN at inference (reference mickey_extractor.py:31-35
runs it under fp16 autocast + no_grad), which makes it the classic
weight-static / activation-dynamic int8 PTQ target. These tests lock the
numerics of the quantized path on synthetic weights; the on-chip speed and
through-the-heads drift readout live in tools/bench_int8_backbone.py
(BENCHLOG round 5). Real-checkpoint quality validation stays blocked on
zero egress, like every other weights-dependent gate (tools/quality_run.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mickey_tpu.nn.dinov2 import vit_forward_features, vit_init
from mickey_tpu.nn.quant import (
    linear_int8,
    quantize_linear_int8,
    vit_quantize_int8,
)


class TestLinearInt8:
    def test_roundtrip_accuracy(self):
        """Per-output-channel weight quant + per-token activation quant on
        gaussian data: relative error must sit at the int8 noise floor."""
        rng = np.random.default_rng(0)
        w = rng.normal(size=(256, 128)).astype(np.float32) * 0.05
        b = rng.normal(size=(128,)).astype(np.float32) * 0.01
        x = rng.normal(size=(4, 32, 256)).astype(np.float32)
        dense = x @ w + b
        q = quantize_linear_int8({"w": jnp.asarray(w), "b": jnp.asarray(b)})
        assert q["w_q"].dtype == jnp.int8
        got = np.asarray(linear_int8(q, jnp.asarray(x)))
        rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
        assert rel < 0.02, rel

    def test_stacked_depth_axis(self):
        """scan-stacked (depth, in, out) weights quantize per (depth, out)
        channel and slice correctly per block."""
        rng = np.random.default_rng(1)
        w = rng.normal(size=(3, 64, 32)).astype(np.float32)
        q = quantize_linear_int8({"w": jnp.asarray(w)})
        assert q["w_q"].shape == (3, 64, 32)
        assert q["w_s"].shape == (3, 1, 32)
        x = rng.normal(size=(2, 5, 64)).astype(np.float32)
        for d in range(3):
            sl = {"w_q": q["w_q"][d], "w_s": q["w_s"][d]}
            got = np.asarray(linear_int8(sl, jnp.asarray(x)))
            rel = np.linalg.norm(got - x @ w[d]) / np.linalg.norm(x @ w[d])
            assert rel < 0.02, (d, rel)

    def test_outlier_channel_isolated(self):
        """Per-output-channel scales mean one huge column cannot wash out
        the precision of the others (the reason per-tensor PTQ fails on
        DINOv2-family weights)."""
        rng = np.random.default_rng(2)
        w = rng.normal(size=(64, 16)).astype(np.float32) * 0.02
        w[:, 7] *= 1000.0
        x = rng.normal(size=(8, 64)).astype(np.float32)
        q = quantize_linear_int8({"w": jnp.asarray(w)})
        got = np.asarray(linear_int8(q, jnp.asarray(x)))
        dense = x @ w
        keep = [j for j in range(16) if j != 7]
        rel = np.linalg.norm(got[:, keep] - dense[:, keep]) / np.linalg.norm(dense[:, keep])
        assert rel < 0.02, rel


class TestVitInt8:
    def test_forward_cosine(self):
        """Tiny ViT end to end: the int8 tree must track the fp32 forward to
        per-token cosine > 0.995 and must actually be int8 underneath."""
        key = jax.random.PRNGKey(0)
        params = vit_init(key, variant="vit_small", ffn_layer="mlp")
        qparams = vit_quantize_int8(params)
        assert qparams["blocks"]["attn"]["qkv"]["w_q"].dtype == jnp.int8
        # unquantized leaves are SHARED, not copied
        assert qparams["patch_embed"]["w"] is params["patch_embed"]["w"]
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 42, 56, 3))
        kw = dict(patch_size=14, num_heads=6, dtype=jnp.float32, use_pallas=False)
        ref = np.asarray(vit_forward_features(params, img, **kw))
        got = np.asarray(vit_forward_features(qparams, img, **kw))
        assert got.shape == ref.shape
        assert np.isfinite(got).all()
        cos = np.sum(ref * got, -1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-12
        )
        assert cos.min() > 0.995, float(cos.min())

    def test_int8_flag_end_to_end(self):
        """cfg.MICKEY.DINOV2.INT8: the inference model quantizes its backbone
        at build time and every serving entry runs finite on the quantized
        tree (the block body dispatches on the param leaves, so no other
        code path changes)."""
        from mickey_tpu.config import default_config
        from mickey_tpu.models.relative_pose import MickeyRelativePose

        cfg = default_config()
        cfg.MICKEY.DINOV2.VARIANT = "vit_small"
        cfg.MICKEY.DINOV2.CHANNEL_DIM = 384
        cfg.MICKEY.DINOV2.FLOAT16 = False
        cfg.MICKEY.DINOV2.INT8 = True
        cfg.MICKEY.KP_HEADS.BLOCKS_DIM = [32, 16, 128, 8]
        cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
        cfg.PROCRUSTES.IT_MATCHES = 2
        cfg.PROCRUSTES.IT_RANSAC = 8
        cfg.PROCRUSTES.NUM_SAMPLED_MATCHES = 12
        cfg.PROCRUSTES.NUM_CORR_3D_3D = 3
        cfg.PROCRUSTES.NUM_REFINEMENTS = 1
        model = MickeyRelativePose(cfg, seed=0)
        assert model.params["dinov2"]["blocks"]["attn"]["qkv"]["w_q"].dtype == jnp.int8
        # idempotent: re-wrapping the quantized params must not double-quantize
        again = MickeyRelativePose(cfg, params=model.params)
        assert again.params["dinov2"]["blocks"]["attn"]["qkv"] is \
            model.params["dinov2"]["blocks"]["attn"]["qkv"]

        rng = np.random.default_rng(0)
        im0 = jnp.asarray(rng.uniform(0, 1, (2, 126, 112, 3)).astype(np.float32))
        im1 = jnp.asarray(rng.uniform(0, 1, (2, 126, 112, 3)).astype(np.float32))
        K = jnp.asarray(
            np.tile(np.array([[[100.0, 0, 56], [0, 100.0, 63], [0, 0, 1]]], np.float32), (2, 1, 1))
        )
        out = model(im0, im1, K, K, lite=True)
        assert out.R.shape == (2, 3, 3)
        assert np.isfinite(np.asarray(out.R)).all()
        assert np.isfinite(np.asarray(out.inliers)).all()

    def test_swiglu_variant(self):
        """The w12/w3 SwiGLU linears take the same dispatch."""
        key = jax.random.PRNGKey(3)
        params = vit_init(key, variant="vit_small", ffn_layer="swiglufused")
        qparams = vit_quantize_int8(params)
        assert qparams["blocks"]["mlp"]["w12"]["w_q"].dtype == jnp.int8
        img = jax.random.uniform(jax.random.PRNGKey(4), (1, 28, 28, 3))
        kw = dict(patch_size=14, num_heads=6, dtype=jnp.float32, use_pallas=False)
        ref = np.asarray(vit_forward_features(params, img, **kw))
        got = np.asarray(vit_forward_features(qparams, img, **kw))
        cos = np.sum(ref * got, -1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-12
        )
        assert cos.min() > 0.995, float(cos.min())
