"""Convergence proof: the composed training loop optimizes (round-4 gap).

Gradient parity (tests/test_parity_loss.py) shows each step's gradient
matches the torch reference; this suite shows the composed system —
REINFORCE pose-error surrogate + Adam/clip/apply_if_finite + BN-stat
threading — actually LEARNS: overfitting a geometrically consistent
synthetic scene (tools/train_curve.py::geometric_fmap_batch — image1's
feature map is a pose-warp of image0's, so true matches and exact
depth/offset readouts exist by construction) must drive the eval loss and
the inference-solver VCRE/rotation error down materially. The reference's
equivalent evidence is its released checkpoints (reference train.py:20-91);
this is the zero-egress proxy. The full 300-step curve artifact is produced
by tools/train_curve.py (TRAIN_CURVE_r{N}.json at the repo root); its
recipe (sigmoid depth head, StepLR) and why it needs them are documented on
tools/train_curve.py::overfit_cfg.

All gates compare LIKE WITH LIKE (advisor round 4): both endpoints are the
deterministic fixed-solver-key eval at the same cadence — never a stochastic
train-window against a deterministic eval. Reference values on this host
(seed 0, 150 steps): eval loss 0.482 -> 0.262, VCRE 30.4 -> 10.6 px,
R_err 83.3 -> 19.2 deg; every gate below has >= 25% margin on those.
"""

import glob
import json
import os

import numpy as np

from tools.train_curve import run_curve

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_overfit_loss_drops(tmp_path):
    curve = run_curve(
        steps=150, eval_every=30, seed=0, lr=4e-4, out_dir=str(tmp_path)
    )
    losses = np.asarray(curve["loss"])
    assert np.isfinite(losses).all(), "non-finite training loss"
    # deterministic eval loss, start vs end (note the null-hypothesis floor
    # ~0.25 at this S=24 scale — see overfit_cfg — bounds the reachable ratio)
    assert curve["eval_loss_ratio"] < 0.70, (
        curve["initial_eval_loss"], curve["final_eval_loss"],
    )
    # the loss is a surrogate — the deployed solver metrics must follow it:
    # VCRE is the Map-free headline, and the rotation must actually resolve
    # (an untrained/collapsed pipeline pins at the zero-pose fallback, 120 deg)
    assert curve["final_vcre"] < 0.6 * curve["initial_vcre"], (
        curve["initial_vcre"], curve["final_vcre"],
    )
    assert curve["final_R_err"] < 45.0, (
        curve["initial_R_err"], curve["final_R_err"],
    )


def test_committed_curve_artifact():
    """The committed TRAIN_CURVE_r{N}.json must be real: produced by the
    shipped tool in fmap mode and actually showing convergence. Guards
    against the round-4 failure mode (a stale artifact from an abandoned
    harness committed at the repo root)."""
    paths = glob.glob(os.path.join(_ROOT, "TRAIN_CURVE_r*.json"))
    assert paths, "no TRAIN_CURVE artifact committed at the repo root"
    latest = max(paths, key=lambda p: int(p.rsplit("_r", 1)[1].split(".")[0]))
    with open(latest) as f:
        curve = json.load(f)
    # schema keys the shipped run_curve always writes
    for k in ("mode", "grad_norm", "eval_loss_ratio", "initial_train_loss_window"):
        assert k in curve, f"{latest} missing '{k}' — stale/foreign artifact"
    assert curve["mode"] == "fmap", curve["mode"]
    assert curve["steps_run"] >= 150
    assert curve["eval_loss_ratio"] <= 0.70, curve["eval_loss_ratio"]
    assert curve["final_vcre"] <= 0.6 * curve["initial_vcre"], (
        curve["initial_vcre"], curve["final_vcre"],
    )
    assert curve["final_R_err"] < 45.0, curve["final_R_err"]
