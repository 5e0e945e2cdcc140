"""Statistical parity: inference RANSAC vs reference estimate_pose_vectorized.

RNG streams differ (torch.multinomial vs Gumbel top-k), so parity is judged
on solver OUTPUT distributions: on a well-determined synthetic problem both
must recover the ground-truth pose; confidences must agree in scale.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import mickey_tpu.geometry.rotations as _rot  # noqa: E402

_t3d = types.ModuleType("transforms3d")
_t3d_quat = types.ModuleType("transforms3d.quaternions")
for name in ("quat2mat", "mat2quat", "qinverse", "qmult", "rotate_vector"):
    setattr(_t3d_quat, name, getattr(_rot, name))
_t3d.quaternions = _t3d_quat
sys.modules.setdefault("transforms3d", _t3d)
sys.modules.setdefault("transforms3d.quaternions", _t3d_quat)
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mickey_tpu.config import default_config  # noqa: E402
from mickey_tpu.solver import estimate_pose  # noqa: E402
from tests.test_ransac import make_scene  # noqa: E402


def run_reference_solver(inputs, it_matches=4, it_ransac=32, num_samples=16, num_corr=3, num_ref=4):
    from lib.models.MicKey.modules.utils.probabilisticProcrustes import (
        e2eProbabilisticProcrustesSolver,
    )

    cfg = default_config()
    cfg.PROCRUSTES.IT_MATCHES = it_matches
    cfg.PROCRUSTES.IT_RANSAC = it_ransac
    cfg.PROCRUSTES.NUM_SAMPLED_MATCHES = num_samples
    cfg.PROCRUSTES.NUM_CORR_3D_3D = num_corr
    cfg.PROCRUSTES.NUM_REFINEMENTS = num_ref
    solver = e2eProbabilisticProcrustesSolver(cfg)

    def t2(a, swap=False):
        a = np.asarray(a)
        return torch.tensor(np.swapaxes(a, 1, 2) if swap else a)

    batch = {
        "final_scores": t2(inputs["final_scores"]),
        "kps0": t2(inputs["kps0"], swap=True),
        "kps1": t2(inputs["kps1"], swap=True),
        "depth_kp0": t2(inputs["depth0"], swap=True),
        "depth_kp1": t2(inputs["depth1"], swap=True),
        "K_color0": t2(inputs["K0"]),
        "K_color1": t2(inputs["K1"]),
    }
    # the reference hardcodes a 2048 reshape (probabilisticProcrustes.py:271);
    # patch it by monkey... instead use the loop variant, which has no
    # hardcoded constant and identical semantics.
    torch.manual_seed(0)
    R, t, conf = solver.estimate_pose(batch)
    return R.numpy(), t.numpy(), conf.numpy()


def test_pose_distribution_parity(rng):
    inputs, (R_gt, t_gt) = make_scene(rng, B=2, N=24, outlier_frac=0.4)
    kw = dict(it_matches=4, it_ransac=32, num_samples=16, num_corr=3)

    R_ref, t_ref, conf_ref = run_reference_solver(inputs, **kw, num_ref=4)
    est = estimate_pose(jax.random.PRNGKey(0), **inputs, **kw, num_refinements=4)

    # both recover ground truth
    np.testing.assert_allclose(R_ref, R_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(est.R), R_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(est.R), R_ref, atol=5e-3)
    np.testing.assert_allclose(np.asarray(est.t), t_ref, atol=5e-3)

    # confidence scale agreement (soft inlier counts over identical geometry)
    ours = np.asarray(est.confidence)
    ref = conf_ref.reshape(-1)
    assert np.abs(ours - ref).max() / ref.max() < 0.2, (ours, ref)
