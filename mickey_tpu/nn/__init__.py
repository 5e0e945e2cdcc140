from .common import (
    batchnorm,
    batchnorm_init,
    conv2d,
    conv2d_init,
    l2_normalize,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
)
from .extractor import (
    Correspondences,
    absolute_kpt_coordinates,
    compute_correspondences,
    extract_features,
    extractor_init,
    model_init,
)
from .matcher import dual_softmax, get_matches_list, match_scores, matcher_init, sinkhorn

__all__ = [
    "batchnorm",
    "batchnorm_init",
    "conv2d",
    "conv2d_init",
    "l2_normalize",
    "layernorm",
    "layernorm_init",
    "linear",
    "linear_init",
    "Correspondences",
    "absolute_kpt_coordinates",
    "compute_correspondences",
    "extract_features",
    "extractor_init",
    "model_init",
    "dual_softmax",
    "get_matches_list",
    "match_scores",
    "matcher_init",
    "sinkhorn",
]
