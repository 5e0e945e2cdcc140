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
    load_torch_state_dict,
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
        if not dinov2_path and not _allow_random_backbone():
            # A trained checkpoint over a random frozen backbone silently
            # produces garbage poses while writing valid-looking outputs —
            # fail loudly instead (opt out for smoke tests only).
            raise FileNotFoundError(
                "Loading a trained checkpoint requires the frozen DINOv2 "
                "backbone weights, which could not be resolved (no local file, "
                "download unavailable). Set MICKEY_DINOV2_PATH / pass "
                "dinov2_path, or set MICKEY_ALLOW_RANDOM_BACKBONE=1 to "
                "knowingly run with a random backbone (smoke tests only)."
            )
        if os.path.isdir(checkpoint):  # orbax
            restored = restore_checkpoint(
                checkpoint, like={"params": {k: v for k, v in params.items() if k != "dinov2"}, "step": 0}
            )
            params.update(restored["params"])
            if dinov2_path:
                params["dinov2"] = convert_dinov2_state_dict(load_torch_state_dict(dinov2_path))
        else:  # reference torch .ckpt
            converted = load_reference_checkpoint(checkpoint, dinov2_path)
            params.update(converted)
    return MickeyRelativePose(cfg, params=params)


def _allow_random_backbone() -> bool:
    return os.environ.get("MICKEY_ALLOW_RANDOM_BACKBONE") == "1"
