"""Convergence proof for the composed training loop (overfit curve).

The reference's de-facto proof that its training recipe learns is its
released checkpoints (reference train.py:20-91 + README:46-48). With zero
egress that artifact is unreachable, so this tool builds the proxy: freeze a
handful of synthetic Map-free-style pairs, run the FULL production train
step (staged forward/backward, REINFORCE pose-error surrogate, Adam +
clip-norm + apply_if_finite, BN-stat threading) until it overfits them, and
record the loss curve plus the *inference-solver* pose/VCRE errors on the
same pairs. If the composed system optimizes, avg_loss and the solver pose
errors must both drop materially from their step-0 values.

Writes TRAIN_CURVE_r{N}.json at the repo root:
    {"steps": [...], "loss": [...], "eval": {"step": [...], "loss": [...],
     "R_err_med": [...], "t_err_med": [...], "vcre_med": [...]},
     "initial_loss", "final_loss", "loss_ratio", ...}

Used by tests/test_convergence.py (short CPU run, asserts the drop) and run
standalone per round for the committed artifact:

    python tools/train_curve.py [--steps 300] [--round 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def overfit_cfg(lr: float = 4e-4):
    """Tiny-model config: same structure as production (all four heads,
    matcher, solver, loss), scaled down for a CPU overfit loop. No
    curriculum masking — every pair contributes every step, so the curve is
    a clean optimization signal.

    Two recipe choices condition the tiny-scale problem (round-5 diagnosis of
    the round-4 plateau, BENCHLOG round 5):

      * Sigmoid depth parametrization (``MAX_DEPTH * sigmoid``, the option the
        reference ships at mickey_extractor.py:213-216; its production recipes
        use the raw linear head). A raw linear depth head initializes
        zero-centered, so at this scale every Kabsch covariance is
        near-rank-deficient (3D points collapse at the origin, half behind the
        camera), all hypotheses are invalid, the tanh-clipped loss saturates,
        and REINFORCE coefficients vanish — measured: grad_norm 0.005 by step
        120, solver pinned at the zero-pose fallback (R_err = arccos(-1/2) =
        120 deg exactly). The sigmoid initializes depths at ~MAX_DEPTH/2,
        inside the synthetic scene's 2-5 m range, making the overfit problem
        well-posed from step 0.
      * StepLR 0.5x/40 steps (the reference's own scheduler option,
        model.py:282-289): at a constant 4e-4 the run converges by ~step 40
        (R_err 83->13 deg) then destabilizes as the sharpening score
        distribution raises REINFORCE variance; the decay pins it.

    The null hypothesis stays ON (production fidelity): ablating it measurably
    hurts — it is the fixed reference point that gives the sampler gradient
    signal while all real hypotheses are bad. Note it also floors the
    training loss at ~0.25 here: at S=24 samples the null's softmax weight
    softmax([~S, 0.35*S]/20) stays ~0.3 (at the production S=512 it is ~6e-8),
    which is why the convergence gates compare like-for-like eval losses
    rather than demanding an absolute ratio below that floor."""
    from mickey_tpu.config import default_config

    cfg = default_config()
    cfg.MICKEY.DINOV2.VARIANT = "vit_small"
    cfg.MICKEY.DINOV2.CHANNEL_DIM = 384
    cfg.MICKEY.DINOV2.FLOAT16 = False
    cfg.MICKEY.KP_HEADS.BLOCKS_DIM = [32, 16, 128, 8]
    cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
    cfg.MICKEY.KP_HEADS.USE_DEPTHSIGMOID = True
    cfg.MICKEY.KP_HEADS.MAX_DEPTH = 8
    cfg.DATASET.WIDTH = 112
    cfg.DATASET.HEIGHT = 126
    cfg.TRAINING.BATCH_SIZE = 8
    cfg.TRAINING.LR = lr
    cfg.TRAINING.LR_STEP_INTERVAL = 40
    cfg.TRAINING.LR_STEP_GAMMA = 0.5
    cfg.LOSS_CLASS.CURRICULUM_LEARNING.TRAIN_CURRICULUM = False
    cfg.LOSS_CLASS.CURRICULUM_LEARNING.TRAIN_WITH_TOPK = False
    gh = cfg.LOSS_CLASS.GENERATE_HYPOTHESES
    gh.IT_MATCHES = 2
    gh.IT_RANSAC = 4
    gh.NUM_CORR_3d3d = 5
    gh.NUM_REF_STEPS = 1
    cfg.LOSS_CLASS.SAMPLER.NUM_SAMPLES_MATCHES = 24
    cfg.PROCRUSTES.IT_MATCHES = 2
    cfg.PROCRUSTES.IT_RANSAC = 4
    cfg.PROCRUSTES.NUM_SAMPLED_MATCHES = 12
    cfg.PROCRUSTES.NUM_CORR_3D_3D = 3
    cfg.PROCRUSTES.NUM_REFINEMENTS = 1
    return cfg


def fixed_batch(seed: int = 0, B: int = 8, H: int = 126, W: int = 112):
    """The frozen overfit set: B synthetic pairs with random images and
    random (R, t) ground truth. The depth head's freedom lets the network
    memorize per-image 3D points consistent with each pair's GT pose."""
    from mickey_tpu.geometry.rotations import quat2mat

    rng = np.random.default_rng(seed)
    T = np.zeros((B, 4, 4), np.float32)
    for b in range(B):
        q = rng.normal(size=4)
        T[b, :3, :3] = quat2mat(q / np.linalg.norm(q))
        T[b, :3, 3] = rng.normal(size=3) * 0.3
        T[b, 3, 3] = 1
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 100
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1
    return {
        "image0": rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
        "image1": rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
        "T_0to1": T,
        "K_color0": K,
        "K_color1": K,
        "Kori_color0": K,
        "Kori_color1": K,
    }


def _axis_angle_R(rng, max_deg: float) -> np.ndarray:
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = np.deg2rad(rng.uniform(-max_deg, max_deg))
    kx, ky, kz = axis
    Kx = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
    return np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * (Kx @ Kx)


def geometric_fmap_batch(
    seed: int, B: int, H: int, W: int, C: int, down: int = 14,
    ident_noise: float = 1.0,
):
    """A geometrically CONSISTENT overfit set in feature-map space.

    Independent random images admit no solution the heads can converge to:
    keypoints live on the patch grid (offsets span one patch), so for an
    arbitrary match (p0, p1) there are generically no positive depths with
    d1*K^-1 p1 = R d0 K^-1 p0 + t — the loss floor is high and descent is a
    crawl (the round-4 first attempt measured loss-ratio ~0.9 over 300
    steps). This builds the task the REAL pipeline solves: image1's feature
    map is a pose-warp of image0's.

    Per pair: every image0 patch gets a random depth and a distinct random
    "identity" feature; its 3D point is transformed by the GT pose and
    projected into image1, whose covering cell receives a copy of the
    identity. Geometry (depth, subpixel offset) and a per-image marker are
    baked into 4 leading channels — linearly decodable, standing in for a
    pretrained DINOv2's geometry-informative features (the pretrained
    weights themselves are unreachable at zero egress). True matches exist
    by construction, their descriptors are near-identical at init (the
    identity spans C-4 dims, and continuous heads preserve closeness), and
    exact-consistency readouts exist — so the composed loop's job is pure
    optimization, which is what this artifact is meant to prove.

    ``ident_noise`` adds N(0, sigma) noise to image1's copy of each identity
    (geometry channels stay clean): with sigma ~ 1 an UNTRAINED descriptor
    head no longer matches true pairs reliably (the init solver fails), so
    the curve has real headroom and the desc head must learn to suppress the
    noise — the learning signal production training provides.

    Returns (batch_dict_without_images, fmap (2B, hp, wp, C) [img0s; img1s]).
    """
    rng = np.random.default_rng(seed)
    hp, wp = H // down, W // down
    fx = fy = 100.0
    cx, cy = W / 2.0, H / 2.0

    T = np.zeros((B, 4, 4), np.float32)
    fmap0 = np.zeros((B, hp, wp, C), np.float32)
    fmap1 = np.zeros((B, hp, wp, C), np.float32)
    for b in range(B):
        R = _axis_angle_R(rng, max_deg=8.0)
        t = rng.normal(size=3) * 0.2
        T[b, :3, :3] = R
        T[b, :3, 3] = t
        T[b, 3, 3] = 1.0

        ident = rng.normal(size=(hp, wp, C)).astype(np.float32)
        d0 = rng.uniform(2.0, 5.0, size=(hp, wp))

        # image0: marker -1, depth, centered keypoint (offset 0.5)
        fmap0[b] = ident
        fmap0[b, :, :, 0] = -1.0
        fmap0[b, :, :, 1] = d0 - 3.5
        fmap0[b, :, :, 2] = 0.0
        fmap0[b, :, :, 3] = 0.0

        # warp each patch center into image1
        ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
        u = (jj + 0.5) * down
        v = (ii + 0.5) * down
        X = np.stack(
            [(u - cx) / fx * d0, (v - cy) / fy * d0, d0], axis=-1
        )  # (hp, wp, 3)
        Y = X @ R.T + t
        z1 = Y[..., 2]
        pu = fx * Y[..., 0] / z1 + cx
        pv = fy * Y[..., 1] / z1 + cy
        j1 = np.floor(pu / down).astype(int)
        i1 = np.floor(pv / down).astype(int)
        ok = (z1 > 0.2) & (i1 >= 0) & (i1 < hp) & (j1 >= 0) & (j1 < wp)

        # fill image1 with fresh (unmatchable) identities first
        bg = rng.normal(size=(hp, wp, C)).astype(np.float32)
        bg[:, :, 0] = 1.0
        bg[:, :, 1] = rng.uniform(2.0, 5.0, size=(hp, wp)) - 3.5
        bg[:, :, 2:4] = 0.0
        fmap1[b] = bg

        # one source per cell: the projection closest to the cell center
        cell_du = pu / down - (j1 + 0.5)
        cell_dv = pv / down - (i1 + 0.5)
        dist = cell_du**2 + cell_dv**2
        order = np.argsort(dist.ravel())[::-1]  # worst first, best overwrite
        for flat in order:
            si, sj = np.unravel_index(flat, (hp, wp))
            if not ok[si, sj]:
                continue
            ti, tj = i1[si, sj], j1[si, sj]
            fmap1[b, ti, tj] = ident[si, sj]
            if ident_noise:
                fmap1[b, ti, tj, 4:] += ident_noise * rng.normal(size=C - 4)
            fmap1[b, ti, tj, 0] = 1.0
            fmap1[b, ti, tj, 1] = z1[si, sj] - 3.5
            fmap1[b, ti, tj, 2] = pu[si, sj] / down - tj - 0.5
            fmap1[b, ti, tj, 3] = pv[si, sj] / down - ti - 0.5

    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0], K[:, 1, 1] = fx, fy
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = cx, cy, 1.0
    batch = {
        "T_0to1": T,
        "K_color0": K,
        "K_color1": K,
        "Kori_color0": K,
        "Kori_color1": K,
    }
    fmap = np.concatenate([fmap0, fmap1], axis=0)
    return batch, fmap


def run_curve(
    steps: int = 300,
    eval_every: int = 25,
    seed: int = 0,
    lr: float = 4e-4,
    out_dir: str = None,
    verbose: bool = False,
    mode: str = "fmap",
    cfg_update=None,
):
    """Run the overfit loop; returns the curve dict (see module docstring).

    ``mode``:
      "fmap" (default) — overfit a geometrically CONSISTENT synthetic scene
        in feature-map space (geometric_fmap_batch) through the cached-
        training path (train_step.grad_step + make_staged_val_step), the
        production situation: frozen DINOv2 features are patch-distinctive
        and geometry-informative. A RANDOM-init frozen ViT is neither — its
        patch features are ~0.87 cosine-similar (rank collapse), and
        independent random image pairs admit no pose-consistent solution at
        all; with zero egress the pretrained weights that would fix both are
        unavailable, so the consistent synthetic scene is the honest
        stand-in.
      "images" — the end-to-end path incl. the random-init frozen backbone
        forward on random (inconsistent) image pairs: exercises plumbing,
        descends slowly; kept for reference.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from mickey_tpu.models.training_model import MicKeyTrainer

    cfg = overfit_cfg(lr=lr)
    if cfg_update:
        # dotted-path overrides, e.g. {"MICKEY.KP_HEADS.MAX_DEPTH": 8}
        for path, val in cfg_update.items():
            node = cfg
            *heads, leaf = path.split(".")
            for h in heads:
                node = getattr(node, h)
            setattr(node, leaf, val)
    B = cfg.TRAINING.BATCH_SIZE
    out_dir = out_dir or tempfile.mkdtemp(prefix="train_curve_")

    def _geom(pair_seed):
        batch, fmap_np = geometric_fmap_batch(
            seed=pair_seed,
            B=B,
            H=cfg.DATASET.HEIGHT,
            W=cfg.DATASET.WIDTH,
            C=cfg.MICKEY.DINOV2.CHANNEL_DIM,
            down=cfg.MICKEY.DINOV2.DOWN_FACTOR,
        )
        arrays = {k: jnp.asarray(v) for k, v in batch.items()}
        return arrays, jnp.asarray(fmap_np)

    fmap = None
    if mode == "stream":
        # held-out eval scene: seed offset no training step ever uses
        eval_arrays, eval_fmap = _geom(seed + 900_000)
    elif mode == "fmap":
        batch, fmap_np = geometric_fmap_batch(
            seed=seed,
            B=B,
            H=cfg.DATASET.HEIGHT,
            W=cfg.DATASET.WIDTH,
            C=cfg.MICKEY.DINOV2.CHANNEL_DIM,
            down=cfg.MICKEY.DINOV2.DOWN_FACTOR,
        )
        fmap = jnp.asarray(fmap_np)
    else:
        batch = fixed_batch(seed=seed, B=B)
    trainer = MicKeyTrainer(cfg, out_dir=out_dir, seed=seed)

    def train_one(sk, step):
        if mode == "stream":
            arrays, step_fmap = _geom(seed * 1_000_000 + step)
            state, metrics = trainer.train_step.grad_step(
                trainer.state, step_fmap, arrays, sk, jnp.float32(100.0)
            )
            trainer.state = state
            return {k: float(v) for k, v in metrics.items()}
        if mode == "fmap":
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if k not in ("image0", "image1")}
            state, metrics = trainer.train_step.grad_step(
                trainer.state, fmap, arrays, sk, jnp.float32(100.0)
            )
            trainer.state = state
            return {k: float(v) for k, v in metrics.items()}
        return trainer.training_step(batch)

    def eval_point():
        # deterministic eval: fixed solver key so the curve reflects the
        # params, not the RANSAC draw
        key = jax.random.PRNGKey(1234)
        if mode == "stream":
            out = trainer._staged_val(trainer.state.params, eval_fmap, eval_arrays, key)
            out = {k: np.asarray(v) for k, v in out.items()}
        elif mode == "fmap":
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if k not in ("image0", "image1")}
            out = trainer._staged_val(trainer.state.params, fmap, arrays, key)
            out = {k: np.asarray(v) for k, v in out.items()}
        else:
            saved = trainer.key
            trainer.key = key
            out = trainer.validation_step(batch)
            trainer.key = saved
        return {
            "loss": float(np.mean(out["loss"])),
            "R_err_med": float(np.median(out["R_err"])),
            "t_err_med": float(np.median(out["t_err_euc"])),
            "vcre_med": float(np.median(out["vcre"])),
        }

    curve = {"steps": [], "loss": [], "grad_norm": [], "grads_finite": [],
             "eval": {
        "step": [], "loss": [], "R_err_med": [], "t_err_med": [], "vcre_med": []}}
    t0 = time.time()
    ev = eval_point()
    curve["eval"]["step"].append(0)
    for k, v in ev.items():
        curve["eval"][k].append(v)
    for step in range(1, steps + 1):
        trainer.key, sk = jax.random.split(trainer.key)
        m = train_one(sk, step)
        curve["steps"].append(step)
        curve["loss"].append(float(m["loss"]))
        curve["grad_norm"].append(float(m.get("grad_norm", float("nan"))))
        curve["grads_finite"].append(bool(m.get("grads_finite", True)))
        if step % eval_every == 0 or step == steps:
            ev = eval_point()
            curve["eval"]["step"].append(step)
            for k, v in ev.items():
                curve["eval"][k].append(v)
            if verbose:
                print(
                    f"step {step:4d}  loss {m['loss']:.4f}  "
                    f"val_loss {ev['loss']:.4f}  R_err {ev['R_err_med']:.2f}deg  "
                    f"t_err {ev['t_err_med']:.3f}m  vcre {ev['vcre_med']:.1f}px  "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
    w = max(1, steps // 10)
    # initial = the deterministic pre-training eval loss (step 0, fixed
    # solver key); final = windowed mean of the last w training losses
    # (REINFORCE is noisy — windows, not endpoints). The geometric task
    # descends within the first ~15 steps, so a head-window mean would
    # understate the drop.
    head = float(curve["eval"]["loss"][0])
    tail = float(np.mean(curve["loss"][-w:]))
    # like-for-like estimator pair (advisor round 4): BOTH endpoints are the
    # deterministic fixed-key eval loss — the train-window tail mixes
    # stochastic REINFORCE draws into one side of the ratio
    eval_head = float(curve["eval"]["loss"][0])
    eval_tail = float(curve["eval"]["loss"][-1])
    curve.update(
        initial_loss=head,
        final_loss=tail,
        loss_ratio=tail / head if head else float("nan"),
        initial_eval_loss=eval_head,
        final_eval_loss=eval_tail,
        eval_loss_ratio=eval_tail / eval_head if eval_head else float("nan"),
        initial_train_loss_window=float(np.mean(curve["loss"][:w])),
        train_fused_topk=bool(cfg.TPU.get("TRAIN_FUSED_TOPK", False)),
        initial_R_err=curve["eval"]["R_err_med"][0],
        final_R_err=curve["eval"]["R_err_med"][-1],
        initial_vcre=curve["eval"]["vcre_med"][0],
        final_vcre=curve["eval"]["vcre_med"][-1],
        steps_run=steps,
        mode=mode,
        lr=lr,
        seed=seed,
        batch_size=cfg.TRAINING.BATCH_SIZE,
        wall_s=round(time.time() - t0, 1),
        platform=__import__("jax").devices()[0].platform,
    )
    return curve


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--mode", choices=("fmap", "images"), default="fmap")
    ap.add_argument("--tpu", action="store_true", help="run on the real chip")
    ap.add_argument(
        "--fused-topk", action="store_true",
        help="TPU.TRAIN_FUSED_TOPK route (prefilter 512 at the 72-cell toy "
        "scale): validates the fused matcher->top-K training route LEARNS, "
        "not just that its gradients match (BENCHLOG round 5)",
    )
    args = ap.parse_args()

    import jax

    if not args.tpu:  # the axon sitecustomize pins 'axon,cpu' (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    cfg_update = None
    if args.fused_topk:
        cfg_update = {"TPU.TRAIN_FUSED_TOPK": True, "TPU.SAMPLING_PREFILTER": 512}

    curve = run_curve(
        steps=args.steps, eval_every=args.eval_every, seed=args.seed,
        lr=args.lr, verbose=True, mode=args.mode, cfg_update=cfg_update,
    )
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"TRAIN_CURVE_r{args.round}.json",
    )
    with open(out, "w") as f:
        json.dump(curve, f, indent=1)
    print(
        f"loss {curve['initial_loss']:.4f} -> {curve['final_loss']:.4f} "
        f"(ratio {curve['loss_ratio']:.3f}); "
        f"R_err {curve['initial_R_err']:.2f} -> {curve['final_R_err']:.2f} deg; "
        f"vcre {curve['initial_vcre']:.1f} -> {curve['final_vcre']:.1f} px; "
        f"wrote {out}"
    )


if __name__ == "__main__":
    main()
