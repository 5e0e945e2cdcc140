"""Golden parity tests: mickey-tpu heads/matcher vs the reference torch code.

The reference implementation at /root/reference is imported (torch CPU) with
randomly initialized weights; our checkpoint converter maps its state_dict
into mickey-tpu params; outputs must match to fp32 tolerance. This validates
both the reimplementation and the converter that will load the released
mickey.ckpt.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mickey_tpu.config import default_config  # noqa: E402
from mickey_tpu.nn.heads import (  # noqa: E402
    basic_block_apply,
    depth_head_apply,
    desc_head_apply,
    det_head_apply,
    offset_head_apply,
)
from mickey_tpu.nn.linear_attention import self_attention_transformer  # noqa: E402
from mickey_tpu.nn.matcher import dual_softmax, sinkhorn  # noqa: E402
from mickey_tpu.training.checkpoint import (  # noqa: E402
    _convert_att_transformer,
    _convert_basic_block,
    _convert_head,
)

# Small-but-representative dims; att layer is hardwired to d_model=128 in the
# reference (transformer.py:96), so BLOCKS_DIM[2] must be 128.
BLOCKS_DIM = [32, 16, 128, 8]
CHANNEL_DIM = 24
H, W, B = 9, 11, 2

REF_CFG = {
    "DINOV2": {"CHANNEL_DIM": CHANNEL_DIM, "DOWN_FACTOR": 14, "FLOAT16": False},
    "KP_HEADS": {
        "BLOCKS_DIM": BLOCKS_DIM,
        "BN": True,
        "USE_SOFTMAX": True,
        "USE_DEPTHSIGMOID": False,
        "MAX_DEPTH": 60,
        "POS_ENCODING": True,
    },
    "DSC_HEAD": {"LAST_DIM": 16, "BLOCKS_DIM": BLOCKS_DIM[:3], "NORM_DSC": True, "POS_ENCODING": True},
}


def tpu_cfg():
    cfg = default_config()
    cfg.MICKEY.DINOV2.CHANNEL_DIM = CHANNEL_DIM
    cfg.MICKEY.KP_HEADS.BLOCKS_DIM = BLOCKS_DIM
    cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
    return cfg


def _randomize_bn_stats(module, seed=0):
    """Give running stats non-trivial values so eval-mode parity exercises them."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def _fmap(seed=0, c=CHANNEL_DIM):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(B, c, H, W)).astype(np.float32)


def to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


@pytest.fixture(autouse=True)
def _highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


class TestBasicBlock:
    @pytest.mark.parametrize("cin,cout", [(8, 8), (8, 16)])
    def test_parity(self, cin, cout):
        from lib.models.MicKey.modules.utils.extractor_utils import BasicBlock

        torch.manual_seed(0)
        blk = BasicBlock(cin, cout, bn=True).eval()
        _randomize_bn_stats(blk)
        x = _fmap(1, cin)
        with torch.no_grad():
            ref = blk(torch.from_numpy(x)).numpy()

        p = _convert_basic_block({k: v for k, v in blk.state_dict().items()}, "")
        out, _ = basic_block_apply(p, to_nhwc(x), train=False)
        np.testing.assert_allclose(from_nhwc(out), ref, atol=2e-5)

    def test_parity_no_relu(self):
        from lib.models.MicKey.modules.utils.extractor_utils import BasicBlock

        torch.manual_seed(1)
        blk = BasicBlock(8, 12, bn=True).eval()
        _randomize_bn_stats(blk, 1)
        x = _fmap(2, 8)
        with torch.no_grad():
            ref = blk(torch.from_numpy(x), relu=False).numpy()
        p = _convert_basic_block(blk.state_dict(), "")
        out, _ = basic_block_apply(p, to_nhwc(x), relu=False, train=False)
        np.testing.assert_allclose(from_nhwc(out), ref, atol=2e-5)


class TestLinearAttentionTransformer:
    @pytest.mark.parametrize("add_pos", [False, True])
    def test_parity(self, add_pos):
        from lib.models.MicKey.modules.att_layers.transformer import Transformer_self_att

        torch.manual_seed(2)
        att = Transformer_self_att(d_model=128, num_layers=3, add_posEnc=add_pos).eval()
        x = _fmap(3, 128)
        with torch.no_grad():
            ref = att(torch.from_numpy(x)).numpy()
        p = _convert_att_transformer(att.state_dict(), "")
        out = self_attention_transformer(p, to_nhwc(x), add_pos_enc=add_pos)
        np.testing.assert_allclose(from_nhwc(out), ref, atol=3e-5)


class TestHeads:
    def _run_pair(self, ref_cls, out_key, our_apply, seed, ref_cfg=None):
        torch.manual_seed(seed)
        head = ref_cls(ref_cfg or REF_CFG).eval()
        _randomize_bn_stats(head, seed)
        x = _fmap(seed)
        with torch.no_grad():
            ref = head(torch.from_numpy(x)).numpy()
        p = _convert_head(head.state_dict(), "", out_key)
        out, _ = our_apply(p, to_nhwc(x), tpu_cfg(), train=False)
        np.testing.assert_allclose(from_nhwc(out), ref, atol=5e-5, rtol=1e-4)

    def test_det_head(self):
        from lib.models.MicKey.modules.mickey_extractor import DeepResBlock_det

        self._run_pair(DeepResBlock_det, "score", det_head_apply, 4)

    def test_offset_head(self):
        from lib.models.MicKey.modules.mickey_extractor import DeepResBlock_offset

        self._run_pair(DeepResBlock_offset, "xy_offset", offset_head_apply, 5)

    def test_depth_head(self):
        from lib.models.MicKey.modules.mickey_extractor import DeepResBlock_depth

        self._run_pair(DeepResBlock_depth, "depth", depth_head_apply, 6)

    def test_desc_head(self):
        from lib.models.MicKey.modules.mickey_extractor import DeepResBlock_desc

        self._run_pair(DeepResBlock_desc, None, desc_head_apply, 7)

    def test_det_head_sigmoid_variant(self):
        from lib.models.MicKey.modules.mickey_extractor import DeepResBlock_det

        ref_cfg = {k: dict(v) for k, v in REF_CFG.items()}
        ref_cfg["KP_HEADS"] = dict(REF_CFG["KP_HEADS"], USE_SOFTMAX=False)
        torch.manual_seed(8)
        head = DeepResBlock_det(ref_cfg).eval()
        _randomize_bn_stats(head, 8)
        x = _fmap(8)
        with torch.no_grad():
            ref = head(torch.from_numpy(x)).numpy()
        cfg = tpu_cfg()
        cfg.MICKEY.KP_HEADS.USE_SOFTMAX = False
        p = _convert_head(head.state_dict(), "", "score")
        out, _ = det_head_apply(p, to_nhwc(x), cfg, train=False)
        np.testing.assert_allclose(from_nhwc(out), ref, atol=5e-5, rtol=1e-4)


class TestMatcher:
    def test_dual_softmax_dustbin(self):
        from lib.models.MicKey.modules.utils.feature_matcher import dualSoftmax

        torch.manual_seed(9)
        ref_m = dualSoftmax({"TEMPERATURE": 0.1, "USE_DUSTBIN": True}).eval()
        rng = np.random.default_rng(9)
        d0 = rng.normal(size=(B, 16, 20)).astype(np.float32)
        d1 = rng.normal(size=(B, 16, 24)).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        with torch.no_grad():
            ref = ref_m(torch.from_numpy(d0), torch.from_numpy(d1)).numpy()

        cfg = default_config()
        params = {"dustbin_score": jnp.asarray(ref_m.dustbin_score.item())}
        out = dual_softmax(params, jnp.asarray(d0.transpose(0, 2, 1)), jnp.asarray(d1.transpose(0, 2, 1)), cfg)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    def test_sinkhorn(self):
        from lib.models.MicKey.modules.utils.feature_matcher import sinkhorn as ref_sinkhorn

        torch.manual_seed(10)
        ref_m = ref_sinkhorn({"DUSTBIN_SCORE_INIT": 1.0, "NUM_IT": 10}).eval()
        # reference sinkhorn hardcodes descriptor_dim=128 normalization
        ref_m.descriptor_dim = 16
        rng = np.random.default_rng(10)
        d0 = rng.normal(size=(B, 16, 12)).astype(np.float32)
        d1 = rng.normal(size=(B, 16, 14)).astype(np.float32)
        with torch.no_grad():
            ref = ref_m(torch.from_numpy(d0), torch.from_numpy(d1), None).numpy()

        cfg = default_config()
        cfg.FEATURE_MATCHER.TYPE = "Sinkhorn"
        params = {"dustbin_score": jnp.asarray(1.0)}
        out = sinkhorn(params, jnp.asarray(d0.transpose(0, 2, 1)), jnp.asarray(d1.transpose(0, 2, 1)), cfg)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


class TestSelfCrossTransformer:
    def test_parity_transformer_att(self):
        from lib.models.MicKey.modules.att_layers.transformer import Transformer_att

        from mickey_tpu.nn.linear_attention import self_cross_transformer
        from mickey_tpu.training.checkpoint import _convert_att_transformer

        torch.manual_seed(11)
        att = Transformer_att(d_model=128, num_layers=2, add_posEnc=True).eval()
        x0 = _fmap(11, 128)
        x1 = _fmap(12, 128)
        with torch.no_grad():
            r0, r1 = att(torch.from_numpy(x0), torch.from_numpy(x1))
        p = _convert_att_transformer(att.state_dict(), "", num_layers=4)
        o0, o1 = self_cross_transformer(p, to_nhwc(x0), to_nhwc(x1), add_pos_enc=True)
        np.testing.assert_allclose(from_nhwc(o0), r0.numpy(), atol=5e-5)
        np.testing.assert_allclose(from_nhwc(o1), r1.numpy(), atol=5e-5)

    def test_full_attention_matches_torch(self):
        from lib.models.MicKey.modules.att_layers.attention import Attention

        from mickey_tpu.nn.linear_attention import full_attention

        torch.manual_seed(12)
        rng = np.random.default_rng(12)
        q = rng.normal(size=(2, 10, 8, 16)).astype(np.float32)
        k = rng.normal(size=(2, 12, 8, 16)).astype(np.float32)
        v = rng.normal(size=(2, 12, 8, 16)).astype(np.float32)
        ref = Attention(attention="full")(*map(torch.from_numpy, (q, k, v))).numpy()
        import jax.numpy as jnp_

        ours = np.asarray(full_attention(jnp_.asarray(q), jnp_.asarray(k), jnp_.asarray(v)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)
