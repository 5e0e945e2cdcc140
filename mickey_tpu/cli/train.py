"""Training CLI (counterpart of reference train.py).

Usage:
    python -m mickey_tpu.cli.train --config config/curriculum_learning.yaml \
        --dataset_config config/mapfree.yaml --experiment my_run
"""

from __future__ import annotations

import argparse
import os
import random
import shutil


def create_exp_name(exp_name: str, cfg) -> str:
    """Reference training_utils.create_exp_name (:386-404)."""
    exp_name += "_Loss_" + cfg.LOSS_CLASS.LOSS_FUNCTION
    exp_name += "_SoftClipping" if cfg.LOSS_CLASS.SOFT_CLIPPING else ""
    if cfg.LOSS_CLASS.CURRICULUM_LEARNING.TRAIN_CURRICULUM:
        exp_name += "_Curriculum"
    elif cfg.LOSS_CLASS.CURRICULUM_LEARNING.TRAIN_WITH_TOPK:
        exp_name += "_TrainTop" + str(cfg.LOSS_CLASS.CURRICULUM_LEARNING.TOPK)
    exp_name += "_NullHypothesis" if cfg.LOSS_CLASS.NULL_HYPOTHESIS.ADD_NULL_HYPOTHESIS else ""
    if cfg.MICKEY.KP_HEADS.USE_DEPTHSIGMOID:
        exp_name += "_DepthSigmoid_" + str(int(cfg.MICKEY.KP_HEADS.MAX_DEPTH))
    exp_name += "_" + cfg.FEATURE_MATCHER.TYPE
    exp_name += "_Debug" if cfg.DEBUG else ""
    return exp_name


def train_model(args):
    from ..config import default_config
    from ..data.loader import DataModuleTraining
    from ..models.training_model import MicKeyTrainer

    cfg = default_config()
    if args.dataset_config:
        cfg.merge_from_file(args.dataset_config)
    if args.config:
        cfg.merge_from_file(args.config)

    if args.feature_cache:
        cfg.TPU.FEATURE_CACHE = args.feature_cache

    exp_name = create_exp_name(args.experiment, cfg)
    print("Start training of " + exp_name)

    cfg.DATASET.SEED = random.randint(0, 1000000)

    out_dir = os.path.join(args.path_weights, exp_name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    if args.config:
        shutil.copyfile(args.config, os.path.join(out_dir, "config_overlay.yaml"))

    trainer = MicKeyTrainer(cfg, out_dir=out_dir, seed=args.seed)
    datamodule = DataModuleTraining(cfg)
    print(
        "Training with {:.2f}/{:.2f} image overlap".format(
            cfg.DATASET.MIN_OVERLAP_SCORE, cfg.DATASET.MAX_OVERLAP_SCORE
        )
    )
    trainer.fit(datamodule, resume_path=args.resume)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="", help="model config yaml overlay")
    parser.add_argument("--dataset_config", default="", help="dataset config yaml overlay")
    parser.add_argument("--experiment", default="MicKey_tpu_default")
    parser.add_argument("--path_weights", default="weights/")
    parser.add_argument("--resume", default=None, help="orbax checkpoint dir to resume from")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--feature_cache",
        default="",
        help="directory for the frozen-backbone feature cache (built on first "
        "run): training skips the DINOv2 forward (training/feature_cache.py)",
    )
    args = parser.parse_args()

    from ..utils.platform import apply_platform_env

    apply_platform_env()
    train_model(args)


if __name__ == "__main__":
    main()
