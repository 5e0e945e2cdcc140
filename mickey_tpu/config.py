"""Configuration system for mickey-tpu.

A small, dependency-free replacement for the yacs ``CfgNode`` tree the
reference uses (see reference ``config/default.py:1-141``).  The schema below
mirrors the reference schema key-for-key so that the YAML presets shipped with
the original project (and the ``config.yaml`` bundled with released weight
archives) load unchanged via :func:`load_config` / ``Config.merge_from_file``.

Design notes (TPU build):
  * The config is a plain nested dict with attribute access.  Model builders
    read it once at trace time; nothing config-shaped crosses into jitted
    code, so the tree does not need to be a pytree or hashable.
  * ``freeze()`` makes a config immutable, which we do after CLI merging so
    accidental mutation inside library code raises.
"""

from __future__ import annotations

import copy
import io
from typing import Any, Dict, Optional

import yaml


class Config(dict):
    """Nested dict with attribute access and yacs-style merging."""

    _FROZEN_KEY = "__frozen__"

    def __init__(self, d: Optional[Dict[str, Any]] = None):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        if d:
            for k, v in d.items():
                self[k] = Config(v) if isinstance(v, dict) else v

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"Config is frozen; cannot set {name!r}")
        self[name] = Config(value) if isinstance(value, dict) and not isinstance(value, Config) else value

    def __setitem__(self, key, value):
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"Config is frozen; cannot set {key!r}")
        super().__setitem__(key, value)

    # -- merging -------------------------------------------------------------
    def merge_from_other(self, other: Dict[str, Any], _path: str = "") -> None:
        for k, v in other.items():
            full = f"{_path}.{k}" if _path else k
            if isinstance(v, dict):
                if k not in self or not isinstance(self[k], Config):
                    self[k] = Config()
                self[k].merge_from_other(v, full)
            else:
                # Reference YAMLs use the literal string 'None' in places
                # (e.g. ``SCENES: None`` in config/datasets/mapfree.yaml).
                if isinstance(v, str) and v == "None":
                    v = None
                self[k] = v

    def merge_from_file(self, path: str) -> None:
        with open(path, "r") as f:
            data = yaml.safe_load(f)
        if data:
            self.merge_from_other(data)

    def merge_from_yaml(self, text: str) -> None:
        data = yaml.safe_load(io.StringIO(text))
        if data:
            self.merge_from_other(data)

    def merge_from_list(self, opts) -> None:
        """Merge from a flat ``[key, value, key, value, ...]`` list.

        Keys use dotted paths, e.g. ``PROCRUSTES.IT_RANSAC 50``.
        """
        assert len(opts) % 2 == 0, "override list must have even length"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            if isinstance(value, str):
                value = yaml.safe_load(value)
            node[parts[-1]] = value

    # -- lifecycle -----------------------------------------------------------
    def clone(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    def freeze(self) -> "Config":
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, Config):
                v.freeze()
        return self

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def default_config() -> Config:
    """Full schema with defaults.

    Mirrors reference ``config/default.py`` (fields there default to ``None``
    and are populated by YAML overlays; here we bake in the values of the
    released ``curriculum_learning.yaml`` + ``datasets/mapfree.yaml`` presets
    so a bare ``default_config()`` builds the flagship model).
    """
    return Config(
        {
            "MODEL": "MicKey",
            "DEBUG": False,
            "MICKEY": {
                "DINOV2": {
                    # reference mickey_extractor.py:12-35
                    "VARIANT": "vit_large",  # TPU build: selectable backbone
                    "DOWN_FACTOR": 14,
                    "CHANNEL_DIM": 1024,
                    "FLOAT16": True,  # TPU build: bfloat16 when True
                    # TPU build: int8 PTQ of the frozen backbone's block
                    # linears (nn/quant.py) at inference-model build time.
                    # Measured +26 ms/batch-16 on the v5e backbone pass
                    # (1.105x, BENCHLOG round 5; synthetic-weight drift
                    # fmap cos 0.9995). Default OFF: real-checkpoint quality
                    # validation is egress-blocked and DINOv2's activation
                    # outliers are the known int8 risk — flip only behind
                    # tools/quality_run.py once weights exist. Single-chip
                    # scope (the TP shardings name the fp32 leaves).
                    "INT8": False,
                },
                "KP_HEADS": {
                    "BLOCKS_DIM": [512, 256, 128, 64],
                    "BN": True,
                    "USE_SOFTMAX": True,
                    "USE_DEPTHSIGMOID": False,
                    "MAX_DEPTH": 60,
                    "POS_ENCODING": True,
                },
                "DSC_HEAD": {
                    "LAST_DIM": 128,
                    "BLOCKS_DIM": [512, 256, 128],
                    "BN": True,
                    "NORM_DSC": True,
                    "POS_ENCODING": True,
                },
            },
            "FEATURE_MATCHER": {
                "TYPE": "DualSoftmax",
                "DUAL_SOFTMAX": {"TEMPERATURE": 0.1, "USE_DUSTBIN": True},
                "SINKHORN": {"NUM_IT": 10, "DUSTBIN_SCORE_INIT": 1.0},
                "USE_TRANSFORMER": False,
                "TOP_KEYPOINTS": False,
            },
            "LOSS_CLASS": {
                "LOSS_FUNCTION": "VCRE",
                "SOFT_CLIPPING": True,
                "POSE_ERR": {"MAX_LOSS_VALUE": 1.5, "MAX_LOSS_SOFTVALUE": 0.8},
                "VCRE": {"MAX_LOSS_VALUE": 90, "MAX_LOSS_SOFTVALUE": 0.8},
                "GENERATE_HYPOTHESES": {
                    "SCORE_TEMPERATURE": 20,
                    "IT_MATCHES": 20,
                    "IT_RANSAC": 20,
                    "INLIER_3D_TH": 0.3,
                    "INLIER_REF_TH": 0.15,
                    "NUM_REF_STEPS": 4,
                    "NUM_CORR_3d3d": 8,
                },
                "CURRICULUM_LEARNING": {
                    "TRAIN_CURRICULUM": True,
                    "TRAIN_WITH_TOPK": True,
                    "TOPK_INIT": 30,
                    "TOPK": 80,
                },
                "NULL_HYPOTHESIS": {"ADD_NULL_HYPOTHESIS": True, "TH_OUTLIERS": 0.35},
                "SAMPLER": {"NUM_SAMPLES_MATCHES": 512},
            },
            "PROCRUSTES": {
                "IT_MATCHES": 20,
                "IT_RANSAC": 100,
                "NUM_SAMPLED_MATCHES": 2048,
                "NUM_CORR_3D_3D": 3,
                "NUM_REFINEMENTS": 4,
                "TH_INLIER": 0.15,
                "TH_SOFT_INLIER": 0.3,
            },
            "PROCRUSTES_TRAINING": {"MAX_CORR_DIST": None, "REFINE": False},
            "DATASET": {
                "DATA_SOURCE": "MapFree",
                "SCENES": None,
                "DATA_ROOT": "data/",
                "SEED": 66,
                "NPZ_ROOT": None,
                "MIN_OVERLAP_SCORE": 0.2,
                "MAX_OVERLAP_SCORE": 0.7,
                "CONSECUTIVE_PAIRS": None,
                "FRAME_RATE": None,
                "AUGMENTATION_TYPE": None,
                "BLACK_WHITE": False,
                "PAIRS_TXT": {"TRAIN": None, "VAL": None, "TEST": None, "ONE_NN": False},
                "HEIGHT": 720,
                "WIDTH": 540,
            },
            "TRAINING": {
                "BATCH_SIZE": 8,
                "NUM_WORKERS": 8,
                # batched C++ JPEG ingest (native/mickey_io.cpp) as the loader
                # decode backend; falls back to cv2-per-sample automatically
                "NATIVE_LOADER": True,
                "NUM_GPUS": 1,  # kept for YAML compat; TPU build uses mesh size
                "SAMPLER": "scene_balance",
                "N_SAMPLES_SCENE": 100,
                "SAMPLE_WITH_REPLACEMENT": True,
                "LR": 1e-4,
                "LR_STEP_INTERVAL": None,
                "LR_STEP_GAMMA": None,
                "VAL_INTERVAL": 0.5,
                "VAL_BATCHES": 100,
                "LOG_INTERVAL": 50,
                "EPOCHS": 100,
                "GRAD_CLIP": 5.0,
            },
            # TPU-specific knobs (no reference counterpart).
            "TPU": {
                "MESH_SHAPE": None,  # e.g. [8] -> 1-D data-parallel mesh; None = all devices
                "BACKBONE_DTYPE": "bfloat16",
                "SAMPLING": "exact",  # 'exact' (lax.top_k) or 'approx' (approx_max_k)
                # two-stage match sampling: reduce the N^2 score matrix once
                # (approx_max_k) to its top-K entries before the it_matches
                # independent draws (0 = exact reference distribution). The
                # dual-softmax match distribution is peaked; 4096 (2x the
                # draw size) retains essentially all mass and measures ~8x
                # faster than exact sampling on v5e.
                "SAMPLING_PREFILTER": 4096,
                "USE_PALLAS_ATTENTION": True,
                # fused RANSAC hypothesis scoring kernel (SURVEY §7 kernel 3):
                # the (B, R, S) distance tensor never leaves VMEM
                "USE_PALLAS_SCORING": True,
                # bf16 conv compute (fp32 accumulation) in the keypoint heads.
                # Default OFF: XLA already runs fp32 convs through single-pass
                # bf16 MXU dots at default precision, and the explicit
                # rounding measured slightly SLOWER (cast ops; heads 30.5 vs
                # 25.5 ms/batch-8 same-process, BENCHLOG round 3). Knob kept
                # for precision experiments.
                "HEADS_BF16": False,
                # two-program train step split at the frozen-backbone
                # boundary (training/train_step.py::make_staged_train_step)
                "STAGED_TRAIN": True,
                # directory of a frozen-backbone feature cache (built on
                # first fit): training skips the DINOv2 forward entirely —
                # valid because the backbone is frozen and the Map-free
                # recipes use no augmentation (training/feature_cache.py).
                # Empty = off.
                "FEATURE_CACHE": "",
                # 'bfloat16' halves disk + host->device traffic (rounds the
                # fp32 feature map); 'float32' is bit-identical to the
                # staged step
                "FEATURE_CACHE_DTYPE": "bfloat16",
                "HEADS_BF16_ON_CPU": False,  # test hook for the rounding path
                # run Pallas kernels in interpret mode (CPU testing of the
                # exact kernel code paths, e.g. the multichip dryrun)
                "PALLAS_INTERPRET": False,
                # flash-attention (block_q, block_k); the padded ViT sequence
                # must divide both or the kernel falls back to 256/512.
                # bq512/bk2048 measured fastest inside the staged backbone
                # (346 vs 380 ms/batch-8, tools/bench_backbone_blocks.py) and
                # compiles reliably now that the backbone is its own program.
                "ATTENTION_BLOCKS": [512, 2048],
                # lax.scan unroll over the 24 ViT blocks (2 measured best:
                # 344 -> 336 ms/batch-8, tools/bench_backbone_blocks.py)
                "SCAN_UNROLL": 2,
                # packed head-major attention kernel: no qkv relayouts
                "PACKED_ATTENTION": True,
                # fused correlation+dustbin+dual-softmax kernel: couplings
                # never materialize in HBM (forward at inference; training
                # additionally needs the analytic custom-VJP variant below)
                "USE_PALLAS_MATCHER": True,
                "USE_PALLAS_MATCHER_GRAD": True,
                # bf16 descriptors into the fused matcher (inference only):
                # halves descriptor traffic, single-pass MXU correlation
                # (vs HIGHEST's 3-pass decomposition). Gated at the
                # pose/confidence level (test_bf16_descriptor_gate); default
                # per the on-chip A/B (BENCHLOG round 3).
                "MATCHER_BF16": False,
                # fused matcher->top-K inference route: the dual-softmax
                # kernel emits the top-SAMPLING_PREFILTER (score, index)
                # table straight from VMEM — the dense (B, N0, N1) fp32
                # score matrix (~15 MB/pair written, then re-read by
                # approx_max_k) never exists. Candidate set = top
                # MATCHER_TOPL entries per query row; L=16 is exact at the
                # production operating point even for worst-case diffuse
                # distributions (L=8 is 98.8% recall — already above the
                # dense route's approx_max_k recall_target=0.95). Inference
                # only; training keeps the dense differentiable path.
                "FUSED_TOPK": True,
                "MATCHER_TOPL": 16,
                # fused matcher->top-K TRAINING route: the loss samples from
                # the kernel's top-P table and reconstructs log final scores
                # from grad-carrying row/col logsumexps, so the dense match
                # matrix (+ its backward cotangent) never exists in training
                # either (ops/fused_matcher.fused_topk_scores_train,
                # training/loss.py::metric_pose_loss_topk). Default OFF —
                # this is a FINE-TUNING lever, not a from-scratch recipe:
                # it is gradient-consistent with the dense route given the
                # same samples (tests/test_fused_matcher.py) and wins
                # +22.6 ms/step on chip (BENCHLOG round 5), but its sampling
                # support is the top-P candidate table, so with UNTRAINED
                # scores the true matches are almost never candidates and
                # REINFORCE gets no signal (measured: the 150-step overfit
                # proxy that converges on the dense route stays at the
                # zero-pose fallback on this route — BENCHLOG round 5).
                # Enable once the matcher is warm (resumed/fine-tune runs).
                "TRAIN_FUSED_TOPK": False,
                "LOG_IMAGES": False,  # TB image panels each LOG_INTERVAL (slow over remote tunnels)
                "DONATE_BUFFERS": True,
            },
        }
    )


def load_config(*yaml_paths: str, overrides=None) -> Config:
    """Build a config: defaults, then YAML overlays in order, then overrides."""
    cfg = default_config()
    for p in yaml_paths:
        cfg.merge_from_file(p)
    if overrides:
        cfg.merge_from_list(overrides)
    return cfg
