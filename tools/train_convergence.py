"""Convergence proof: the composed training loop (REINFORCE surrogate + Adam
+ BN-stat threading + curriculum + apply_if_finite) actually optimizes.

The reference's de-facto proof is its released checkpoints (train.py:20-91 +
README); with zero egress this builds the proxy the round-3 VERDICT asked
for: a synthetic task with a KNOWN learnable signal, trained for a few
hundred steps, loss + pose error curves emitted as TRAIN_CURVE_r4.json.

Task design (genuinely learnable, not memorization): image1 is image0
rolled LEFT by exactly one 14-px patch column, ground truth is the pure
camera translation consistent with that pixel shift at a fixed scene depth
Z_GT — a fronto-parallel plane. Content-identical patches make the matcher
naturally peak on the shifted diagonal even at random init; the METRIC pose
error is then dominated by the translation scale, which is wrong until the
depth head learns to output Z_GT. Gradients reach the depth head through
the differentiable Kabsch solver (training/loss.py), so a learning loop
that works must drive t_err (and the loss) down by calibrating depth; a
loop with broken gradients/optimizer/BN threading cannot.

Usage: python tools/train_convergence.py [--steps 300] [--out TRAIN_CURVE_r4.json]
CPU-friendly (tiny vit_small model, ~1-2 s/step); pass --tpu to run on the chip.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATCH = 14
Z_GT = 2.0
FOCAL = 100.0


def make_cfg():
    from mickey_tpu.config import default_config

    cfg = default_config()
    cfg.MICKEY.DINOV2.VARIANT = "vit_small"
    cfg.MICKEY.DINOV2.CHANNEL_DIM = 384
    cfg.MICKEY.DINOV2.FLOAT16 = False
    cfg.MICKEY.KP_HEADS.BLOCKS_DIM = [32, 16, 128, 8]
    cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
    cfg.DATASET.WIDTH = 112
    cfg.DATASET.HEIGHT = 126
    gh = cfg.LOSS_CLASS.GENERATE_HYPOTHESES
    gh.IT_MATCHES, gh.IT_RANSAC, gh.NUM_CORR_3d3d, gh.NUM_REF_STEPS = 4, 8, 3, 2
    cfg.LOSS_CLASS.SAMPLER.NUM_SAMPLES_MATCHES = 32
    cfg.PROCRUSTES.IT_MATCHES = 2
    cfg.PROCRUSTES.IT_RANSAC = 8
    cfg.PROCRUSTES.NUM_SAMPLED_MATCHES = 16
    cfg.PROCRUSTES.NUM_CORR_3D_3D = 3
    cfg.PROCRUSTES.NUM_REFINEMENTS = 1
    return cfg


def shifted_pair_batch(rng, B, H, W, shift=PATCH):
    """Fixed-depth fronto-parallel scene: image1 = roll(image0, -shift) and
    the metric GT translation that pixel shift implies at depth Z_GT."""
    im0 = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    im1 = np.roll(im0, -shift, axis=2)
    T = np.zeros((B, 4, 4), np.float32)
    T[:, 0, 0] = T[:, 1, 1] = T[:, 2, 2] = T[:, 3, 3] = 1
    T[:, 0, 3] = -shift * Z_GT / FOCAL  # u1 = u0 - shift  =>  t_x = -s*Z/f
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = FOCAL
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1
    return {
        "image0": im0,
        "image1": im1,
        "T_0to1": T,
        "K_color0": K,
        "K_color1": K,
        "Kori_color0": K,
        "Kori_color1": K,
    }


def run(steps=300, batch=8, n_pairs=8, eval_every=25, seed=0, out=None):
    import jax

    from mickey_tpu.models.training_model import MicKeyTrainer

    cfg = make_cfg()
    H, W = cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH
    rng = np.random.default_rng(seed)
    # a fixed pool of pairs, cycled — overfitting them is the point
    pool = [shifted_pair_batch(rng, batch, H, W) for _ in range(max(1, n_pairs // batch))]

    trainer = MicKeyTrainer(cfg, out_dir="/tmp/mickey_convergence", seed=seed)

    def eval_pose():
        outs = [trainer.validation_step(b) for b in pool]
        r = float(np.mean([np.asarray(o["R_err"]) for o in outs]))
        t = float(np.mean([np.asarray(o["t_err_euc"]) for o in outs]))
        return r, t

    curve = {"step": [], "loss": [], "R_err_deg": [], "t_err_m": []}
    r0, t0 = eval_pose()
    losses = []
    t_start = time.time()
    for s in range(steps):
        m = trainer.training_step(pool[s % len(pool)])
        losses.append(float(m["loss"]))
        if (s + 1) % eval_every == 0 or s == 0:
            r, t = eval_pose()
            curve["step"].append(s + 1)
            curve["loss"].append(float(np.mean(losses[-eval_every:])))
            curve["R_err_deg"].append(r)
            curve["t_err_m"].append(t)
            print(
                f"step {s+1:4d}  loss {curve['loss'][-1]:.4f}  "
                f"R_err {r:.2f}deg  t_err {t:.4f}m  "
                f"({(time.time()-t_start)/(s+1):.2f}s/step)",
                flush=True,
            )

    k = max(1, len(losses) // 10)
    result = {
        "task": "shifted-pair depth calibration (see module docstring)",
        "steps": steps,
        "batch": batch,
        "backend": jax.default_backend(),
        "loss_first10pct": float(np.mean(losses[:k])),
        "loss_last10pct": float(np.mean(losses[-k:])),
        "loss_ratio": float(np.mean(losses[-k:]) / max(np.mean(losses[:k]), 1e-9)),
        "t_err_init_m": t0,
        "t_err_final_m": curve["t_err_m"][-1],
        "R_err_init_deg": r0,
        "R_err_final_deg": curve["R_err_deg"][-1],
        "curve": curve,
    }
    print(json.dumps({kk: vv for kk, vv in result.items() if kk != "curve"}, indent=2))
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {out}")
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--out", default=None)
    ap.add_argument("--tpu", action="store_true", help="run on the TPU backend")
    args = ap.parse_args()
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    run(steps=args.steps, batch=args.batch, eval_every=args.eval_every, out=args.out)
