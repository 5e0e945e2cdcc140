"""bf16 conv compute in the keypoint heads (cfg.TPU.HEADS_BF16).

On TPU the heads' fp32 convs are MXU-emulated at ~1/3 rate; the fast path
rounds ONLY the conv matmul inputs to bf16 (fp32 accumulation, BN/residual/
outputs fp32). This locks the numerics contract on CPU via the
HEADS_BF16_ON_CPU hook: outputs must track the fp32 reference to ~bf16
rounding noise, and the mode must leave BN running stats untouched in eval.
Reference behavior spec: modules/mickey_extractor.py:67-251 (heads are fp32
there; this is a documented TPU-native deviation like DINOV2.FLOAT16).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from mickey_tpu.config import default_config
from mickey_tpu.nn.heads import (
    depth_head_apply,
    depth_head_init,
    det_head_apply,
    det_head_init,
    heads_conv_dtype,
)


def _small_cfg(bf16_on_cpu: bool):
    cfg = default_config()
    cfg.MICKEY.DINOV2.CHANNEL_DIM = 64
    cfg.MICKEY.KP_HEADS.BLOCKS_DIM = [48, 32, 32, 16]
    cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
    cfg.TPU.HEADS_BF16_ON_CPU = bf16_on_cpu
    if bf16_on_cpu:
        cfg.TPU.HEADS_BF16 = True
    return cfg


class TestHeadsBf16:
    def test_dtype_gate(self):
        assert heads_conv_dtype(_small_cfg(False)) is None  # default: fp32
        on = _small_cfg(True)
        on.TPU.HEADS_BF16 = True
        assert heads_conv_dtype(on) == jnp.bfloat16
        off = _small_cfg(True)
        off.TPU.HEADS_BF16 = False
        assert heads_conv_dtype(off) is None

    def test_outputs_track_fp32_within_rounding(self):
        cfg32 = _small_cfg(False)
        cfg16 = _small_cfg(True)
        rng = np.random.default_rng(0)
        fmap = jnp.asarray(rng.normal(size=(2, 12, 10, 64)).astype(np.float32))

        for init, apply in ((det_head_init, det_head_apply), (depth_head_init, depth_head_apply)):
            p = init(jax.random.PRNGKey(1), cfg32)
            ref, _ = apply(p, fmap, cfg32, train=False)
            out, new_p = apply(p, fmap, cfg16, train=False)
            assert out.dtype == jnp.float32  # outputs stay fp32
            ref_n, out_n = np.asarray(ref), np.asarray(out)
            # bf16 rounding noise through 4 resblocks: small relative to scale
            scale = np.abs(ref_n).max() + 1e-12
            assert np.abs(out_n - ref_n).max() / scale < 0.05
            assert np.corrcoef(out_n.ravel(), ref_n.ravel())[0, 1] > 0.999
            # eval mode must not touch BN state
            for blk in ("resblock1", "resblock4"):
                np.testing.assert_array_equal(
                    np.asarray(new_p[blk]["bn1"]["mean"]), np.asarray(p[blk]["bn1"]["mean"])
                )

    def test_train_mode_stats_in_fp32(self):
        """BN batch statistics are computed from fp32 conv outputs — bf16
        mode must produce finite, close stats in train mode too."""
        cfg16 = _small_cfg(True)
        cfg32 = _small_cfg(False)
        rng = np.random.default_rng(2)
        fmap = jnp.asarray(rng.normal(size=(2, 12, 10, 64)).astype(np.float32))
        p = det_head_init(jax.random.PRNGKey(3), cfg32)
        _, p32 = det_head_apply(p, fmap, copy.deepcopy(cfg32), train=True)
        _, p16 = det_head_apply(p, fmap, copy.deepcopy(cfg16), train=True)
        m32 = np.asarray(p32["resblock1"]["bn1"]["mean"])
        m16 = np.asarray(p16["resblock1"]["bn1"]["mean"])
        assert np.isfinite(m16).all()
        np.testing.assert_allclose(m16, m32, rtol=0.05, atol=5e-3)
