"""Checkpoint I/O: torch reference converters + orbax-backed native format.

Converts the reference's released artifacts into mickey-tpu parameter pytrees:
  * ``dinov2_vitl14_pretrain.pth`` — the frozen backbone weights;
  * ``mickey.ckpt`` / ``mickey_sc.ckpt`` — Lightning checkpoints holding
    heads + matcher only (DINOv2 stripped on save, reference model.py:291-298).

Layout conversions: conv OIHW -> HWIO, linear (out, in) -> (in, out), BN
weight/bias/running_mean/running_var -> scale/bias/mean/var. Transformer
blocks are stacked on a leading depth axis for lax.scan.

Native checkpoints use orbax with the same DINOv2-exclusion convention.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    """torch tensor -> numpy (host)."""
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(t) -> jnp.ndarray:
    return jnp.asarray(_np(t).transpose(2, 3, 1, 0))  # OIHW -> HWIO


def _lin(t) -> jnp.ndarray:
    return jnp.asarray(_np(t).T)  # (out, in) -> (in, out)


def _vec(t) -> jnp.ndarray:
    return jnp.asarray(_np(t))


# -- DINOv2 backbone -------------------------------------------------------------


def _qkv_to_head_major(w: jnp.ndarray, b: jnp.ndarray, num_heads: int):
    """Permute fused-qkv columns from torch's [q|k|v] (t-major) to the
    head-major (h, t, d) layout nn/dinov2.py computes in — contiguous chunks
    of the 3C output dim then equal whole head groups, so the tensor-parallel
    column sharding (parallel.vit_tp_shardings) needs no resharding at the
    (B, S, 3C) -> (B, S, H, 3, D) reshape."""
    cin, c3 = w.shape
    d = c3 // (3 * num_heads)
    w = w.reshape(cin, 3, num_heads, d).transpose(0, 2, 1, 3).reshape(cin, c3)
    b = b.reshape(3, num_heads, d).transpose(1, 0, 2).reshape(c3)
    return w, b


def convert_dinov2_state_dict(sd: Dict[str, Any], depth: int = 24) -> Params:
    """torch DINOv2 state_dict -> vit params pytree (see nn/dinov2.py).

    The fused qkv weight is column-permuted to head-major (``_qkv_to_head_major``).
    """
    dim = int(_np(sd["blocks.0.norm1.weight"]).shape[0])
    num_heads = {384: 6, 768: 12, 1024: 16, 1536: 24}[dim]
    blocks = []
    for i in range(depth):
        pre = f"blocks.{i}."
        qkv_w, qkv_b = _qkv_to_head_major(
            _lin(sd[pre + "attn.qkv.weight"]), _vec(sd[pre + "attn.qkv.bias"]), num_heads
        )
        blocks.append(
            {
                "norm1": {"scale": _vec(sd[pre + "norm1.weight"]), "bias": _vec(sd[pre + "norm1.bias"])},
                "attn": {
                    "qkv": {"w": qkv_w, "b": qkv_b},
                    "proj": {"w": _lin(sd[pre + "attn.proj.weight"]), "b": _vec(sd[pre + "attn.proj.bias"])},
                },
                "ls1": {"gamma": _vec(sd[pre + "ls1.gamma"])},
                "norm2": {"scale": _vec(sd[pre + "norm2.weight"]), "bias": _vec(sd[pre + "norm2.bias"])},
                "mlp": (
                    {
                        "fc1": {"w": _lin(sd[pre + "mlp.fc1.weight"]), "b": _vec(sd[pre + "mlp.fc1.bias"])},
                        "fc2": {"w": _lin(sd[pre + "mlp.fc2.weight"]), "b": _vec(sd[pre + "mlp.fc2.bias"])},
                    }
                    if pre + "mlp.fc1.weight" in sd
                    else {
                        "w12": {"w": _lin(sd[pre + "mlp.w12.weight"]), "b": _vec(sd[pre + "mlp.w12.bias"])},
                        "w3": {"w": _lin(sd[pre + "mlp.w3.weight"]), "b": _vec(sd[pre + "mlp.w3.bias"])},
                    }
                ),
                "ls2": {"gamma": _vec(sd[pre + "ls2.gamma"])},
            }
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "patch_embed": {"w": _conv(sd["patch_embed.proj.weight"]), "b": _vec(sd["patch_embed.proj.bias"])},
        "cls_token": _vec(sd["cls_token"]),
        "pos_embed": _vec(sd["pos_embed"]),
        "blocks": stacked,
        "norm": {"scale": _vec(sd["norm.weight"]), "bias": _vec(sd["norm.bias"])},
    }


# -- heads + matcher --------------------------------------------------------------


def _convert_basic_block(sd: Dict[str, Any], pre: str) -> Params:
    p: Params = {"conv1": {"w": _conv(sd[pre + "conv1.weight"])}, "conv2": {"w": _conv(sd[pre + "conv2.weight"])}}
    if pre + "bn1.weight" in sd:
        for bn in ("bn1", "bn2"):
            p[bn] = {
                "scale": _vec(sd[f"{pre}{bn}.weight"]),
                "bias": _vec(sd[f"{pre}{bn}.bias"]),
                "mean": _vec(sd[f"{pre}{bn}.running_mean"]),
                "var": _vec(sd[f"{pre}{bn}.running_var"]),
            }
    if pre + "shortcut.0.weight" in sd:
        p["shortcut"] = {"w": _conv(sd[pre + "shortcut.0.weight"])}
    return p


def _convert_att_transformer(sd: Dict[str, Any], pre: str, num_layers: int = 3) -> Params:
    layers = []
    for i in range(num_layers):
        lp = f"{pre}layers.{i}."
        layers.append(
            {
                "q_proj": {"w": _lin(sd[lp + "q_proj.weight"])},
                "k_proj": {"w": _lin(sd[lp + "k_proj.weight"])},
                "v_proj": {"w": _lin(sd[lp + "v_proj.weight"])},
                "merge": {"w": _lin(sd[lp + "merge.weight"])},
                "mlp_fc1": {"w": _lin(sd[lp + "mlp.0.weight"])},
                "mlp_fc2": {"w": _lin(sd[lp + "mlp.2.weight"])},
                "norm1": {"scale": _vec(sd[lp + "norm1.weight"]), "bias": _vec(sd[lp + "norm1.bias"])},
                "norm2": {"scale": _vec(sd[lp + "norm2.weight"]), "bias": _vec(sd[lp + "norm2.bias"])},
            }
        )
    return {"layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers)}


_HEAD_OUT_KEY = {"det_head": "score", "det_offset": "xy_offset", "depth_head": "depth", "dsc_head": None}


def _convert_head(sd: Dict[str, Any], pre: str, out_key: Optional[str]) -> Params:
    p: Params = {}
    for i in range(1, 5):
        p[f"resblock{i}"] = _convert_basic_block(sd, f"{pre}resblock{i}.")
    p["att"] = _convert_att_transformer(sd, f"{pre}att_layer.")
    p["out"] = {"w": _conv(sd[f"{pre}{out_key}.weight"])} if out_key else None
    return p


def convert_mickey_state_dict(sd: Dict[str, Any]) -> Params:
    """Reference Lightning state_dict (heads + matcher) -> params pytree.

    Accepts either raw state_dict or {'state_dict': ...} checkpoint, with the
    ``compute_matches.`` prefix of MicKeyTrainingModel / MickeyRelativePose.
    """
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {re.sub(r"^compute_matches\.", "", k): v for k, v in sd.items()}

    params: Params = {}
    for head, out_key in _HEAD_OUT_KEY.items():
        params[head] = _convert_head(sd, f"extractor.{head}.", out_key)
    matcher: Params = {}
    if "matcher.matching_mat.dustbin_score" in sd:
        matcher["dustbin_score"] = _vec(sd["matcher.matching_mat.dustbin_score"])
    params["matcher"] = matcher
    return params


def load_torch_state_dict(path: str):
    """torch.load restricted to tensors (weights_only=True).

    Checkpoint paths are resolved from env vars / CWD / auto-download, so full
    pickle would be an arbitrary-code-execution surface. Plain state_dicts
    (DINOv2 .pth) never need it; Lightning .ckpt files may carry non-tensor
    metadata, so fall back to full unpickling only on explicit opt-in.
    """
    import torch  # local import: torch is host-side only

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if os.environ.get("MICKEY_UNSAFE_TORCH_LOAD") != "1":
            raise RuntimeError(
                f"{path} is not loadable with weights_only=True. If you trust "
                "this file, set MICKEY_UNSAFE_TORCH_LOAD=1 to allow full "
                "unpickling."
            )
        return torch.load(path, map_location="cpu", weights_only=False)


def load_reference_checkpoint(ckpt_path: str, dinov2_path: Optional[str] = None) -> Params:
    """Load mickey.ckpt (+ optional dinov2 .pth) into a full model pytree."""
    ckpt = load_torch_state_dict(ckpt_path)
    params = convert_mickey_state_dict(ckpt)
    if dinov2_path:
        params["dinov2"] = convert_dinov2_state_dict(load_torch_state_dict(dinov2_path))
    return params


_DINOV2_URL = (
    "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitl14/dinov2_vitl14_pretrain.pth"
)


def resolve_dinov2_weights(path: Optional[str] = None, download: bool = True) -> Optional[str]:
    """Locate (or fetch) the frozen DINOv2 ViT-L/14 weights.

    Mirrors the reference's bootstrap convention (``mickey_extractor.py:14-17``
    downloads from fbaipublicfiles at init). Resolution order:
      1. an explicit ``path`` argument (returned as-is if it exists);
      2. ``$MICKEY_DINOV2_PATH``;
      3. ``weights/dinov2_vitl14_pretrain.pth`` under the CWD;
      4. ``~/.cache/mickey_tpu/dinov2_vitl14_pretrain.pth``;
      5. if ``download``, fetch the official release into the cache dir.

    Returns the resolved path, or None when unavailable (e.g. zero-egress
    environments) — callers fall back to random init with a warning rather
    than failing, so the pipeline stays runnable without the 1.2 GB file.
    """
    candidates = [
        path,
        os.environ.get("MICKEY_DINOV2_PATH"),
        os.path.join("weights", "dinov2_vitl14_pretrain.pth"),
        os.path.expanduser("~/.cache/mickey_tpu/dinov2_vitl14_pretrain.pth"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    if not download or os.environ.get("MICKEY_NO_DOWNLOAD"):
        return None
    if _DOWNLOAD_FAILED:  # don't re-pay the network timeout every init
        return None
    target = os.path.expanduser("~/.cache/mickey_tpu/dinov2_vitl14_pretrain.pth")
    try:
        import shutil
        import urllib.request

        os.makedirs(os.path.dirname(target), exist_ok=True)
        tmp = target + ".part"
        with urllib.request.urlopen(_DINOV2_URL, timeout=15) as r, open(tmp, "wb") as f:
            shutil.copyfileobj(r, f)
        os.replace(tmp, target)
        return target
    except Exception as e:  # no network / blocked egress
        import logging

        _DOWNLOAD_FAILED.append(True)
        logging.getLogger(__name__).warning(
            "DINOv2 weights not found locally and download failed (%s: %s); "
            "set MICKEY_DINOV2_PATH or pass --dinov2. Falling back to random "
            "backbone init.", type(e).__name__, e,
        )
        return None


_DOWNLOAD_FAILED: list = []


# -- native (orbax) checkpoints ----------------------------------------------------


def save_checkpoint(path: str, params: Params, step: int = 0, opt_state=None, extra=None) -> None:
    """Save an orbax checkpoint, excluding the frozen DINOv2 weights
    (reference convention, model.py:291-298)."""
    import orbax.checkpoint as ocp

    to_save = {k: v for k, v in params.items() if k != "dinov2"}
    payload = {"params": to_save, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra is not None:
        payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, like: Optional[Dict] = None) -> Dict:
    """Restore an orbax checkpoint; DINOv2 weights must be re-hydrated by the
    caller (reference convention, model.py:300-306)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=like)
