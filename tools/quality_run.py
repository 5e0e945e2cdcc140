"""One-command real-weights quality gate (VERDICT r2 item 8).

The north-star quality target — VCRE-AUC parity against the reference's
released mickey.ckpt (reference README.md:46-68) — is blocked by zero egress:
the weights aren't on disk. This script makes it a 5-minute task the moment
they exist:

    python tools/quality_run.py --mickey /path/mickey.ckpt \
        --dinov2 /path/dinov2_vitl14_pretrain.pth \
        --dataset /path/mapfree --split val [--scenes 5]

Steps:
  1. convert the torch checkpoint (training/checkpoint converters);
  2. run the toy-example demo pair (sanity: a finite, confident pose);
  3. run a val-slice submission (``--scenes`` limits breadth);
  4. score it with the offline evaluator (evaluation/mapfree.py) and print
     the AUC/precision table next to BASELINE.md's parity thresholds.

``--dry-run`` exercises the full path with random weights on a synthesized
micro-dataset (no downloads, asserts plumbing only) — tested in
tests/test_quality_run.py so the gate cannot rot while weights are absent.
"""

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Parity thresholds: the reference's published Map-free val numbers for
# MicKey (paper Table; reference README.md quotes the benchmark site).
# A converted checkpoint should land within a few percent of these. Keys are
# evaluation.mapfree.summarize output keys.
EXPECTED = {
    "AUC @ VCRE < 90px": 0.71,
    "AUC @ Pose Error < (25.0cm, 5deg)": 0.31,
}
TOLERANCE = 0.05


def synthesize_micro_dataset(root: Path, n_scenes: int = 2, n_frames: int = 3):
    """A tiny Map-free-format val split (see reference data docs): scene dirs
    with poses.txt / intrinsics.txt / seq0+seq1 jpgs."""
    import numpy as np

    try:
        import cv2
    except ImportError:
        cv2 = None
    rng = np.random.default_rng(0)
    W, H = 540, 720
    for s in range(n_scenes):
        scene = root / "val" / f"s{s:05d}"
        (scene / "seq0").mkdir(parents=True, exist_ok=True)
        (scene / "seq1").mkdir(parents=True, exist_ok=True)
        poses, intr = [], []
        frames = [("seq0/frame_00000.jpg", 0)] + [
            (f"seq1/frame_{i:05d}.jpg", i) for i in range(n_frames)
        ]
        for name, _ in frames:
            img = (rng.uniform(0, 255, (H, W, 3))).astype("uint8")
            if cv2 is not None:
                cv2.imwrite(str(scene / name), img)
            else:
                from PIL import Image

                Image.fromarray(img).save(scene / name)
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            tvec = rng.normal(size=3) * 0.1
            poses.append(f"{name} {q[0]} {q[1]} {q[2]} {q[3]} {tvec[0]} {tvec[1]} {tvec[2]}")
            intr.append(f"{name} 520.0 520.0 {W/2} {H/2} {W} {H}")
        (scene / "poses.txt").write_text("\n".join(poses) + "\n")
        (scene / "intrinsics.txt").write_text("\n".join(intr) + "\n")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mickey", default="", help="reference mickey.ckpt")
    parser.add_argument("--dinov2", default=None, help="dinov2_vitl14_pretrain.pth")
    parser.add_argument("--dataset", default="", help="Map-free dataset root")
    parser.add_argument("--split", default="val")
    parser.add_argument("--scenes", type=int, default=0, help="limit scene count (0 = all)")
    parser.add_argument("--out", default="", help="output dir (default: tmp)")
    parser.add_argument("--dry-run", action="store_true",
                        help="random weights + synthesized micro-dataset")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from mickey_tpu.config import default_config
    from mickey_tpu.models import build_model

    out_root = Path(args.out) if args.out else Path(tempfile.mkdtemp(prefix="mickey_quality_"))
    out_root.mkdir(parents=True, exist_ok=True)
    cfg = default_config()

    if args.dry_run:
        os.environ["MICKEY_ALLOW_RANDOM_BACKBONE"] = "1"
        dataset = out_root / "dataset"
        synthesize_micro_dataset(dataset)
        checkpoint = ""
        # keep the micro-run fast on CPU: small backbone + tiny RANSAC budget
        cfg.MICKEY.DINOV2.VARIANT = "vit_small"
        cfg.MICKEY.DINOV2.CHANNEL_DIM = 384
        cfg.MICKEY.DINOV2.FLOAT16 = False
        cfg.MICKEY.KP_HEADS.BLOCKS_DIM = [32, 16, 128, 8]
        cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
        pc = cfg.PROCRUSTES
        pc.IT_MATCHES, pc.IT_RANSAC, pc.NUM_SAMPLED_MATCHES = 2, 8, 64
        cfg.TPU.SAMPLING_PREFILTER = 0
        cfg.DATASET.WIDTH, cfg.DATASET.HEIGHT = 112, 126
        resize = (112, 126)  # (W, H) like cfg.DATASET
    else:
        if not args.mickey or not args.dataset:
            parser.error("--mickey and --dataset are required (or use --dry-run)")
        checkpoint = args.mickey
        dataset = Path(args.dataset)
        resize = None
    cfg.DATASET.DATA_ROOT = str(dataset)
    if args.scenes:
        split_dir = dataset / args.split
        cfg.DATASET.SCENES = sorted(
            s.name for s in split_dir.iterdir() if s.is_dir()
        )[: args.scenes]

    # -- 1. load + convert -----------------------------------------------------
    print(f"[quality] building model (checkpoint={checkpoint or '<random>'})", flush=True)
    model = build_model(cfg, checkpoint=checkpoint, dinov2_path=args.dinov2)

    # -- 2. toy-example demo sanity -------------------------------------------
    toy = Path(os.environ.get("MICKEY_TOY_EXAMPLE", "/root/reference/data/toy_example"))
    if toy.exists():
        import jax.numpy as jnp

        from mickey_tpu.data.io import pad_to_multiple, read_color_image, read_intrinsics

        im0 = pad_to_multiple(read_color_image(str(toy / "im0.jpg"), resize))
        im1 = pad_to_multiple(read_color_image(str(toy / "im1.jpg"), resize))
        Ks, _ = read_intrinsics(str(toy / "intrinsics.txt"), resize)
        K0, K1 = Ks["im0.jpg"][None], Ks["im1.jpg"][None]
        est = model(jnp.asarray(im0[None]), jnp.asarray(im1[None]),
                    jnp.asarray(K0), jnp.asarray(K1), key=jax.random.PRNGKey(0))
        conf = float(est.inliers[0])
        assert np.isfinite(np.asarray(est.R)).all(), "demo pose has NaNs"
        print(f"[quality] demo pair OK: confidence={conf:.1f}", flush=True)
        if not args.dry_run and conf < 50:
            print("[quality] WARNING: demo confidence is low for trained weights", flush=True)

    # -- 3. val-slice submission ----------------------------------------------
    from mickey_tpu.cli.submission import eval_split

    sub_args = argparse.Namespace(
        config="", dataset_config="", checkpoint=checkpoint, dinov2=args.dinov2,
        output_root=out_root, split=args.split, batch_size=None,
    )
    print(f"[quality] running {args.split} submission -> {out_root}", flush=True)
    eval_split(sub_args, cfg=cfg, model=model)

    # -- 4. offline evaluation -------------------------------------------------
    from mickey_tpu.evaluation.mapfree import evaluate

    metrics, _curves = evaluate(out_root / "submission.zip", dataset / args.split)
    print(json.dumps(metrics, indent=2, default=float), flush=True)
    if not args.dry_run:
        ok = True
        for k, want in EXPECTED.items():
            got = metrics.get(k)
            if got is not None and got < want - TOLERANCE:
                print(f"[quality] FAIL {k}: {got:.3f} < {want - TOLERANCE:.3f}", flush=True)
                ok = False
        print("[quality] PARITY " + ("PASS" if ok else "FAIL"), flush=True)
        return 0 if ok else 1
    print("[quality] dry run complete (plumbing OK; no parity claim)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
