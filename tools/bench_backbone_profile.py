"""Backbone ablation profile on the real chip (VERDICT r2 item 1).

The round-2 backbone ran at 73.5 TF/s of matmul FLOPs vs a 119.6 TF/s
same-chip matmul calibration. This script decomposes the gap with
same-process A/B variants (the only trustworthy methodology on the drifting
tunnel — CLAUDE.md):

  kernel_old      packed flash attention, fp32-upcast matmuls (round-2 code)
  kernel_new      packed flash attention, stored-dtype (bf16) MXU matmuls
  kernel_bq1024   new kernel, block_q=1024
  kernel_bq2048   new kernel, block_q=2048 (one q block)
  backbone        full ViT-L forward, production config
  backbone_noattn attention replaced by a v-passthrough (bounds attention share)
  backbone_lnbf16 layernorm statistics in bf16 instead of fp32
  patch_embed     patch-embed conv + pos-embed add alone

All timings are scalar-fetch synchronized with per-iteration input variation
(tunnel acks dispatches before execution; see CLAUDE.md).

Usage: python tools/bench_backbone_profile.py [--iters 8] [--skip a,b]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W = 16, 714, 532  # production bench operating point
SEQ = 1939  # 51*38 patches + cls
SPAD = 2048


def timeit(name, fn, args_for, iters):
    """Compile (with retry against the flaky remote service) then time."""
    import jax

    for attempt in range(4):
        try:
            t0 = time.perf_counter()
            v = float(fn(*args_for(0)))
            print(f"  [{name}] warmup {time.perf_counter()-t0:.1f}s (v={v:.4g})", flush=True)
            break
        except Exception as e:
            if attempt == 3:
                print(f"  [{name}] FAILED: {type(e).__name__}: {e}", flush=True)
                return None
            print(f"  [{name}] warmup attempt {attempt} failed ({type(e).__name__}); retry", flush=True)
            time.sleep(10)
    t0 = time.perf_counter()
    for i in range(iters):
        v = float(fn(*args_for(i + 1)))
        assert np.isfinite(v)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:18s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--skip", default="", help="comma-separated variant names to skip")
    args = parser.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mickey_tpu.nn.common import layernorm, linear
    from mickey_tpu.nn.dinov2 import interpolate_pos_encoding, vit_init
    from mickey_tpu.nn import dinov2 as dv
    from mickey_tpu.ops import flash_attention as fa

    params = vit_init(jax.random.PRNGKey(0), "vit_large")
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    qkv = jnp.asarray(rng.normal(size=(B, SPAD, 3072)).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    results = {}

    # -- attention kernel micro A/B ------------------------------------------------
    def old_packed_kernel(qkvq_ref, qkvs_ref, o_ref, *, scale, seq_len, block_k, head_dim, heads_per_block):
        """Round-2 kernel body: fp32-upcast q/k/v before the MXU dots."""
        hd = head_dim
        num_kb = qkvs_ref.shape[1] // block_k
        for j in range(heads_per_block):
            base = j * 3 * hd
            q = qkvq_ref[0, :, base : base + hd].astype(jnp.float32)

            def load_kv(i, base=base):
                return (
                    qkvs_ref[0, pl.ds(i * block_k, block_k), base + hd : base + 2 * hd].astype(jnp.float32),
                    qkvs_ref[0, pl.ds(i * block_k, block_k), base + 2 * hd : base + 3 * hd].astype(jnp.float32),
                )

            out = fa._online_softmax_attend(q, load_kv, num_kb, block_k, seq_len, scale)
            o_ref[0, :, j * hd : (j + 1) * hd] = out.astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("bq", "bk", "old"))
    def kern(qkv, eps, bq, bk, old):
        x = qkv + eps.astype(qkv.dtype)
        if old:
            b, s, c3 = x.shape
            grid = (b, 8, s // bq)
            out = pl.pallas_call(
                functools.partial(old_packed_kernel, scale=0.125, seq_len=SEQ, block_k=bk,
                                  head_dim=64, heads_per_block=2),
                out_shape=jax.ShapeDtypeStruct((b, s, 1024), x.dtype),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, bq, 384), lambda bi, hp, qi: (bi, qi, hp), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, s, 384), lambda bi, hp, qi: (bi, 0, hp), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, bq, 128), lambda bi, hp, qi: (bi, qi, hp), memory_space=pltpu.VMEM),
            )(x, x)
        else:
            out = fa.flash_attention_packed(x, SEQ, 16, block_q=bq, block_k=bk)
        return jnp.sum(out.astype(jnp.float32))

    for name, bq, bk, old in [
        ("kernel_old", 512, 2048, True),
        ("kernel_new", 512, 2048, False),
        ("kernel_bq1024", 1024, 2048, False),
        ("kernel_bq2048", 2048, 2048, False),
    ]:
        if name in skip:
            continue
        results[name] = timeit(
            name, lambda q, e, bq=bq, bk=bk, old=old: kern(q, e, bq, bk, old),
            lambda i: (qkv, jnp.float32(1e-6 * i)), args.iters,
        )
        if results[name]:
            # 24 layers' worth, and effective TF/s of the 2*2*B*H*S^2*D flops
            fl = 4 * B * 16 * SPAD * SPAD * 64
            print(f"    -> x24 = {24*results[name]:.1f} ms, {fl/results[name]/1e9:.1f} TF/s", flush=True)

    # -- full backbone variants ------------------------------------------------
    def block_apply_variant(x, bp, ln_dtype, attn_mode):
        bsz, s, c = x.shape
        h = layernorm(bp["norm1"], x.astype(ln_dtype), eps=1e-6).astype(x.dtype)
        qkv = linear(bp["attn"]["qkv"], h)
        if attn_mode == "kernel":
            attn = fa.multi_head_attention_packed(qkv, SEQ, 16, use_pallas=True, blocks=(512, 2048))
        else:  # "skip": v-passthrough, keeps proj matmul fed, no attention math
            attn = qkv.reshape(bsz, s, 16, 3, 64)[:, :, :, 2].reshape(bsz, s, c)
        attn = linear(bp["attn"]["proj"], attn)
        x = x + bp["ls1"]["gamma"].astype(x.dtype) * attn
        h = layernorm(bp["norm2"], x.astype(ln_dtype), eps=1e-6).astype(x.dtype)
        h = linear(bp["mlp"]["fc1"], h)
        h = jax.nn.gelu(h, approximate=False)
        h = linear(bp["mlp"]["fc2"], h)
        return x + bp["ls2"]["gamma"].astype(x.dtype) * h

    @functools.partial(jax.jit, static_argnames=("ln_dtype", "attn_mode"))
    def backbone_variant(params, images, eps, ln_dtype, attn_mode):
        x = images + eps
        h0, w0 = H // 14, W // 14
        x = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), params["patch_embed"]["w"].astype(jnp.bfloat16),
            (14, 14), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["patch_embed"]["b"].astype(jnp.bfloat16)
        x = x.reshape(B, h0 * w0, -1)
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + interpolate_pos_encoding(params["pos_embed"], h0, w0).astype(x.dtype)
        x = jnp.pad(x, ((0, 0), (0, SPAD - SEQ), (0, 0)))

        dt = jnp.float32 if ln_dtype == "f32" else jnp.bfloat16

        def body(carry, bp):
            return block_apply_variant(carry, bp, dt, attn_mode), None

        x, _ = jax.lax.scan(body, x, params["blocks"], unroll=2)
        x = layernorm(params["norm"], x[:, :SEQ].astype(jnp.float32), eps=1e-6)
        return jnp.sum(x)

    @jax.jit
    def patch_embed_only(params, images, eps):
        x = images + eps
        x = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), params["patch_embed"]["w"].astype(jnp.bfloat16),
            (14, 14), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def patch_embed_einsum(params, images, eps):
        x = (images + eps).astype(jnp.bfloat16)
        h0, w0 = H // 14, W // 14
        x = x.reshape(B, h0, 14, w0, 14, 3)
        x = jnp.einsum("bipjqc,pqcd->bijd", x, params["patch_embed"]["w"].astype(jnp.bfloat16))
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def patch_embed_gather_mm(params, images, eps):
        # row-major patch extraction via reshape/transpose then ONE (BP, 588)
        # x (588, C) matmul
        x = (images + eps).astype(jnp.bfloat16)
        h0, w0 = H // 14, W // 14
        x = x.reshape(B, h0, 14, w0, 14, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B * h0 * w0, 588)
        w = params["patch_embed"]["w"].astype(jnp.bfloat16).reshape(588, -1)
        return jnp.sum((x @ w).astype(jnp.float32))

    @jax.jit
    def backbone_prod(params, images, eps):
        f = dv.vit_features_chw(params, images + eps, use_pallas=True,
                                attn_blocks=(512, 2048), scan_unroll=2)
        return jnp.sum(f)

    variants = [
        ("backbone", lambda p, im, e: backbone_variant(p, im, e, "f32", "kernel")),
        ("backbone_prod", backbone_prod),
        ("backbone_noattn", lambda p, im, e: backbone_variant(p, im, e, "f32", "skip")),
        ("backbone_lnbf16", lambda p, im, e: backbone_variant(p, im, e, "bf16", "kernel")),
        ("patch_embed", patch_embed_only),
        ("patch_embed_einsum", patch_embed_einsum),
        ("patch_embed_gather_mm", patch_embed_gather_mm),
    ]
    for name, fn in variants:
        if name in skip:
            continue
        results[name] = timeit(
            name, fn, lambda i: (params, images, jnp.float32(1e-9 * i)), args.iters
        )

    print("\n== summary (ms) ==", flush=True)
    for k, v in results.items():
        print(f"{k:18s} {v if v is None else round(v, 2)}", flush=True)
    bb = results.get("backbone")
    if bb:
        matmul_tflop = 19.8  # ViT-L block matmuls at S=2048, B=16 (BENCHLOG calc)
        print(f"matmul-only TF/s: {matmul_tflop*1e3/bb:.1f}", flush=True)


if __name__ == "__main__":
    main()
