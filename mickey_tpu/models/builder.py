"""Model builder (counterpart of reference ``lib/models/builder.py``).

Builds a :class:`MickeyRelativePose` from a config + checkpoint. Accepts:
  * a reference Lightning ``.ckpt`` (heads + matcher; DINOv2 supplied
    separately via ``dinov2_path`` or random-initialized),
  * a mickey-tpu orbax checkpoint directory,
  * empty string -> random init (smoke tests / from-scratch training).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..nn.extractor import model_init
from ..training.checkpoint import (
    convert_dinov2_state_dict,
    load_reference_checkpoint,
    resolve_dinov2_weights,
    restore_checkpoint,
)
from .relative_pose import MickeyRelativePose


def build_model(cfg, checkpoint: str = "", dinov2_path: Optional[str] = None, seed: int = 0):
    if cfg.MODEL != "MicKey":
        raise NotImplementedError(cfg.MODEL)

    params = model_init(jax.random.PRNGKey(seed), cfg)
    if checkpoint:
        # checkpoints exclude the frozen backbone (reference model.py:291-306);
        # re-hydrate it like the reference's auto-download bootstrap
        dinov2_path = resolve_dinov2_weights(dinov2_path)
        if os.path.isdir(checkpoint):  # orbax
            restored = restore_checkpoint(
                checkpoint, like={"params": {k: v for k, v in params.items() if k != "dinov2"}, "step": 0}
            )
            params.update(restored["params"])
            if dinov2_path:
                import torch  # host-side only

                dsd = torch.load(dinov2_path, map_location="cpu", weights_only=False)
                params["dinov2"] = convert_dinov2_state_dict(dsd)
        else:  # reference torch .ckpt
            converted = load_reference_checkpoint(checkpoint, dinov2_path)
            params.update(converted)
    return MickeyRelativePose(cfg, params=params)
