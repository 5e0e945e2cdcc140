"""mickey-tpu: a TPU-native metric relative-pose framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
nianticlabs/mickey (CVPR 2024 "MicKey: Metric Keypoints"): end-to-end metric
relative pose between two RGB images via DINOv2 features, keypoint
offset/depth/score/descriptor heads, differentiable dual-softmax matching and
probabilistic Procrustes RANSAC — built SPMD-first on jax.sharding meshes
with Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

from . import config as _config

Config = _config.Config
default_config = _config.default_config
load_config = _config.load_config

__all__ = ["Config", "default_config", "load_config", "__version__"]
