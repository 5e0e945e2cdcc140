from .sampling import gumbel_topk_sample, weighted_sample_without_replacement

__all__ = ["gumbel_topk_sample", "weighted_sample_without_replacement"]
