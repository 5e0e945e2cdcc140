"""Two-image relative pose demo CLI (counterpart of reference demo_inference.py).

Usage:
    python -m mickey_tpu.cli.demo \
        --im_path_ref data/toy_example/im0.jpg \
        --im_path_dst data/toy_example/im1.jpg \
        --intrinsics data/toy_example/intrinsics.txt \
        --checkpoint weights/mickey.ckpt [--config config.yaml]

Prints the estimated pose and writes colorized depth + score maps next to the
inputs (or into --out_dir).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def run_demo_inference(args):
    import jax
    import jax.numpy as jnp

    from ..config import default_config
    from ..data.io import pad_to_multiple, read_color_image
    from ..geometry import mat2quat
    from ..models import build_model
    from ..utils.viz import colorize_depth, prepare_score_map

    cfg = default_config()
    if args.config:
        cfg.merge_from_file(args.config)

    print("Preparing data...")
    resize = tuple(args.resize) if args.resize else None
    im0 = pad_to_multiple(read_color_image(args.im_path_ref, resize))
    im1 = pad_to_multiple(read_color_image(args.im_path_dst, resize))

    from ..data.io import read_intrinsics

    Ks, _ = read_intrinsics(args.intrinsics, resize)
    im0_name = os.path.basename(args.im_path_ref)
    im1_name = os.path.basename(args.im_path_dst)
    K0 = Ks[im0_name][None]
    K1 = Ks[im1_name][None]

    print("Building model...")
    model = build_model(cfg, checkpoint=args.checkpoint, dinov2_path=args.dinov2)

    print("Running MicKey-TPU relative pose estimation...")
    out = model(jnp.asarray(im0[None]), jnp.asarray(im1[None]), jnp.asarray(K0), jnp.asarray(K1),
                key=jax.random.PRNGKey(args.seed))

    R = np.asarray(out.R[0])
    t = np.asarray(out.t[0]).reshape(-1)
    conf = float(out.inliers[0])
    print(f"R (im0 -> im1):\n{np.array2string(R, precision=4)}")
    print(f"t: {np.array2string(t, precision=4)}  |t|={np.linalg.norm(t):.3f} m")
    print(f"q (wxyz): {np.array2string(mat2quat(R) if np.isfinite(R).all() and np.abs(R).max() > 0 else np.zeros(4), precision=4)}")
    print(f"confidence (soft inliers): {conf:.1f}   valid: {bool(out.valid[0])}")

    print("Saving depth and score maps...")
    import cv2

    out_dir = Path(args.out_dir) if args.out_dir else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)

    def _path(src: str, suffix: str) -> str:
        ext = src.split(".")[-1]
        dst = src.replace(f".{ext}", f".{suffix}.jpg")
        return str(out_dir / os.path.basename(dst)) if out_dir else dst

    d0 = np.asarray(out.corr.depth_map0[0, :, :, 0])
    d1 = np.asarray(out.corr.depth_map1[0, :, :, 0])
    cv2.imwrite(_path(args.im_path_ref, "depth"), colorize_depth(d0, invalid_mask=d0 < 0.001))
    cv2.imwrite(_path(args.im_path_dst, "depth"), colorize_depth(d1, invalid_mask=d1 < 0.001))
    cv2.imwrite(_path(args.im_path_ref, "score"), prepare_score_map(np.asarray(out.corr.scr0[0]), im0))
    cv2.imwrite(_path(args.im_path_dst, "score"), prepare_score_map(np.asarray(out.corr.scr1[0]), im1))

    if args.save_matches:
        from ..nn.matcher import get_matches_list
        from ..utils.viz import draw_matches

        fs = np.asarray(out.corr.final_scores[0])
        matches = get_matches_list(fs)
        pts0 = np.asarray(out.corr.kps0[0])[matches[:, 0]]
        pts1 = np.asarray(out.corr.kps1[0])[matches[:, 1]]
        scores = fs[matches[:, 0], matches[:, 1]]
        canvas = draw_matches(im0, im1, pts0, pts1, scores)
        cv2.imwrite(
            _path(args.im_path_ref, "matches"), (255 * canvas[:, :, ::-1]).astype(np.uint8)
        )
        print(f"Saved {len(matches)} mutual-NN matches visualization.")

    if args.generate_3D_vis:
        from ..solver.procrustes_ransac import extract_inliers
        from ..utils.render3d import get_render_offscreen
        from ..utils.viz3d import create_point_cloud_from_inliers

        print("Generating 3D visualization image...")
        inliers = extract_inliers(out.estimate, 0)
        pts, colors = create_point_cloud_from_inliers(inliers, K0[0])
        P = np.eye(4)
        P[:3, :3], P[:3, 3] = R, t
        frame = get_render_offscreen(
            P, im0, im1, K0[0], K1[0], pts, colors,
            total_matches=cfg.PROCRUSTES.NUM_SAMPLED_MATCHES,
        )
        vis_path = _path(args.im_path_ref, "3d_vis")
        cv2.imwrite(vis_path, frame[:, :, ::-1])
        print(f"Saved {vis_path}")
    print("Done.")
    return out


def main():
    parser = argparse.ArgumentParser(description="MicKey-TPU two-image demo")
    parser.add_argument("--im_path_ref", default="data/toy_example/im0.jpg")
    parser.add_argument("--im_path_dst", default="data/toy_example/im1.jpg")
    parser.add_argument("--intrinsics", default="data/toy_example/intrinsics.txt")
    parser.add_argument("--resize", nargs=2, type=int, default=None, help="(w, h)")
    parser.add_argument("--config", default="", help="path to config yaml")
    parser.add_argument("--checkpoint", default="", help="reference .ckpt or orbax dir ('' = random init)")
    parser.add_argument("--dinov2", default=None, help="path to dinov2_vitl14_pretrain.pth")
    parser.add_argument("--out_dir", default="", help="directory for output maps (default: next to inputs)")
    parser.add_argument("--save_matches", action="store_true", help="also save a match visualization")
    parser.add_argument("--generate_3D_vis", action="store_true",
                        help="render cameras + inlier point cloud to 3d_vis image")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from ..utils.platform import apply_platform_env

    apply_platform_env()
    run_demo_inference(args)


if __name__ == "__main__":
    main()
