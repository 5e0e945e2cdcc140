"""Descriptor matchers: dual-softmax (with learnable dustbin) and Sinkhorn.

Counterparts of reference ``modules/utils/feature_matcher.py``. All dense
(B, N, N) work — XLA fuses the correlation matmul with the softmaxes; a
dedicated Pallas fusion lives in ops/ for the inference hot path.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def matcher_init(cfg) -> Params:
    fm = cfg.FEATURE_MATCHER
    if fm.TYPE == "DualSoftmax":
        p: Params = {}
        if fm.DUAL_SOFTMAX.USE_DUSTBIN:
            p["dustbin_score"] = jnp.asarray(1.0, jnp.float32)
        return p
    elif fm.TYPE == "Sinkhorn":
        return {"dustbin_score": jnp.asarray(float(fm.SINKHORN.DUSTBIN_SCORE_INIT), jnp.float32)}
    raise ValueError(f"unknown matcher type {fm.TYPE}")


def dual_softmax(params: Params, dsc0: jnp.ndarray, dsc1: jnp.ndarray, cfg) -> jnp.ndarray:
    """dsc0, dsc1: (B, N, C) L2-normalized descriptors -> (B, N0, N1) scores.

    Matches reference ``dualSoftmax.forward`` (feature_matcher.py:64-83):
    correlation / temperature, optional dustbin row+col augmentation,
    softmax(dim1) * softmax(dim2), cropped back to (N0, N1).
    """
    fm = cfg.FEATURE_MATCHER.DUAL_SOFTMAX
    scores = (
        jnp.einsum("bnc,bmc->bnm", dsc0, dsc1, precision=_MATMUL_PRECISION) / fm.TEMPERATURE
    )
    if fm.USE_DUSTBIN:
        b, m, n = scores.shape
        alpha = params["dustbin_score"].astype(scores.dtype)
        bins0 = jnp.full((b, m, 1), alpha)
        bins1 = jnp.full((b, 1, n + 1), alpha)
        couplings = jnp.concatenate(
            [jnp.concatenate([scores, bins0], axis=-1), bins1], axis=1
        )
        couplings = jax.nn.softmax(couplings, axis=1) * jax.nn.softmax(couplings, axis=2)
        scores = couplings[:, :-1, :-1]
    else:
        scores = jax.nn.softmax(scores, axis=1) * jax.nn.softmax(scores, axis=2)
    return scores


def sinkhorn(params: Params, dsc0: jnp.ndarray, dsc1: jnp.ndarray, cfg) -> jnp.ndarray:
    """SuperGlue-style log-domain optimal transport
    (feature_matcher.py:93-137). Returns exp(Z)[:, :-1, :-1]."""
    num_it = cfg.FEATURE_MATCHER.SINKHORN.NUM_IT
    d = dsc0.shape[-1]
    scores = jnp.einsum("bnc,bmc->bnm", dsc0, dsc1, precision=_MATMUL_PRECISION) / (d**0.5)

    b, m, n = scores.shape
    alpha = params["dustbin_score"].astype(scores.dtype)
    bins0 = jnp.full((b, m, 1), alpha)
    bins1 = jnp.full((b, 1, n + 1), alpha)
    couplings = jnp.concatenate([jnp.concatenate([scores, bins0], axis=-1), bins1], axis=1)

    norm = -jnp.log(jnp.asarray(m + n, scores.dtype))
    log_mu = jnp.concatenate([jnp.full((m,), norm), jnp.log(jnp.asarray([n], scores.dtype)) + norm])
    log_nu = jnp.concatenate([jnp.full((n,), norm), jnp.log(jnp.asarray([m], scores.dtype)) + norm])
    log_mu = jnp.broadcast_to(log_mu, (b, m + 1))
    log_nu = jnp.broadcast_to(log_nu, (b, n + 1))

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return (u, v), None

    (u, v), _ = jax.lax.scan(body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)), None, length=num_it)
    Z = couplings + u[:, :, None] + v[:, None, :] - norm
    return jnp.exp(Z)[:, :-1, :-1]


def match_scores(
    params: Params, dsc0: jnp.ndarray, dsc1: jnp.ndarray, cfg, allow_fused: bool = False
) -> jnp.ndarray:
    if cfg.FEATURE_MATCHER.TYPE == "DualSoftmax":
        fm = cfg.FEATURE_MATCHER.DUAL_SOFTMAX
        interpret = bool(cfg.TPU.get("PALLAS_INTERPRET", False))
        if cfg.TPU.get("USE_PALLAS_MATCHER", True) and (
            interpret or jax.default_backend() != "cpu"
        ):
            # Pallas fusion: couplings never materialize in HBM. Inference
            # (allow_fused) takes the forward-only kernel; training takes the
            # analytic-VJP variant so the backward streams through VMEM too.
            dustbin = params.get("dustbin_score", jnp.float32(0.0))
            kw = dict(temperature=float(fm.TEMPERATURE), use_dustbin=bool(fm.USE_DUSTBIN),
                      interpret=interpret)
            if allow_fused:
                from ..ops.fused_matcher import fused_dual_softmax

                if cfg.TPU.get("MATCHER_BF16", False):
                    # inference-only: halve descriptor traffic + single-pass
                    # MXU correlation; pose/confidence-level parity gated in
                    # tests/test_fused_matcher.py::test_bf16_descriptor_gate
                    dsc0 = dsc0.astype(jnp.bfloat16)
                    dsc1 = dsc1.astype(jnp.bfloat16)
                return fused_dual_softmax(dsc0, dsc1, dustbin, **kw)
            if cfg.TPU.get("USE_PALLAS_MATCHER_GRAD", True):
                from ..ops.fused_matcher import fused_dual_softmax_vjp

                return fused_dual_softmax_vjp(dsc0, dsc1, dustbin, **kw)
        return dual_softmax(params, dsc0, dsc1, cfg)
    return sinkhorn(params, dsc0, dsc1, cfg)


def get_matches_list(scores: np.ndarray, min_conf: float = 0.0) -> np.ndarray:
    """Mutual-nearest-neighbor match extraction for visualization (host-side).

    scores: (N0, N1) numpy. Returns (M, 2) int array sorted by descending
    score. Counterpart of ``featureMatcher.get_matches_list``
    (feature_matcher.py:19-46) — including its quirk of computing mutual NN
    on scores[:-1, :-1] (dustbin-style crop) and ranking by exp(score).
    """
    s = np.asarray(scores)
    core = s[:-1, :-1]
    idx0 = core.argmax(axis=1)
    idx1 = core.argmax(axis=0)
    mutual = np.arange(core.shape[0]) == idx1[idx0]
    mscores = np.where(mutual, np.exp(core.max(axis=1)), 0.0)
    valid = mutual & (mscores > min_conf)
    rows = np.nonzero(valid)[0]
    cols = idx0[rows]
    matches = np.stack([rows, cols], axis=1)
    order = np.argsort(-s[rows, cols])
    return matches[order]


def mutual_matches_device(final_scores: jnp.ndarray, k: int = 60):
    """Device-side mutual-NN match extraction, top-k by score.

    final_scores: (N0, N1). Returns (idx0, idx1, score) each (k,), padded
    with -1/-inf where fewer than k mutual matches exist. Device analog of
    ``get_matches_list`` that avoids transferring the dense matrix to host
    (the reference pulls the full matrix, feature_matcher.py:19-46).
    """
    core = final_scores[:-1, :-1]  # reference crops the last row/col
    idx0 = jnp.argmax(core, axis=1)
    idx1 = jnp.argmax(core, axis=0)
    mutual = jnp.arange(core.shape[0]) == idx1[idx0]
    score = jnp.where(mutual, jnp.max(core, axis=1), -jnp.inf)
    top_s, top_r = jax.lax.top_k(score, k)
    valid = jnp.isfinite(top_s)
    rows = jnp.where(valid, top_r, -1)
    cols = jnp.where(valid, idx0[top_r], -1)
    return rows, cols, jnp.where(valid, top_s, 0.0)
