"""Convergence proof: the composed training loop optimizes (round-4 gap).

Gradient parity (tests/test_parity_loss.py) shows each step's gradient
matches the torch reference; this suite shows the composed system —
REINFORCE pose-error surrogate + Adam/clip/apply_if_finite + BN-stat
threading — actually LEARNS: overfitting a geometrically consistent
synthetic scene (tools/train_curve.py::geometric_fmap_batch — image1's
feature map is a pose-warp of image0's, so true matches and exact
depth/offset readouts exist by construction) must drive the training loss
and the inference-solver VCRE down materially. The reference's equivalent
evidence is its released checkpoints (reference train.py:20-91); this is
the zero-egress proxy. The full 400-step curve artifact is produced by
tools/train_curve.py (TRAIN_CURVE_r{N}.json at the repo root).
"""

import numpy as np

from tools.train_curve import run_curve


def test_overfit_loss_drops(tmp_path):
    curve = run_curve(
        steps=120, eval_every=60, seed=0, lr=4e-4, out_dir=str(tmp_path)
    )
    losses = np.asarray(curve["loss"])
    assert np.isfinite(losses).all(), "non-finite training loss"
    # windowed tail mean vs the deterministic pre-training eval loss
    # (REINFORCE is noisy; windows, not endpoints)
    assert curve["final_loss"] < 0.5 * curve["initial_loss"], (
        curve["initial_loss"], curve["final_loss"],
    )
    # and the inference-solver VCRE on the overfit pairs improves too: the
    # loss is a surrogate — the deployed metric must follow it (R_err is
    # draw-noisy at this tiny solver budget; VCRE is the Map-free headline)
    assert curve["final_vcre"] < 0.75 * curve["initial_vcre"], (
        curve["initial_vcre"], curve["final_vcre"],
    )
