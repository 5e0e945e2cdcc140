"""Training orchestration (counterpart of MicKeyTrainingModel + pl.Trainer).

Replaces Lightning with a small explicit loop: jitted train/val steps over a
data-parallel mesh, curriculum scheduling (topK +5/epoch up to TOPK,
reference model.py:61-64), TensorBoard logging (scalars + image panels every
LOG_INTERVAL steps), epoch-end precision/AUC aggregation
(model.py:205-280), and orbax checkpointing with best-VCRE / best-pose /
last policies (train.py:32-55) under the DINOv2-exclusion convention.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluation.pose_io import precision_recall
from ..parallel import batch_sharding, get_mesh, mesh_tp, pad_batch, replicate, shard_backbone
from ..training.checkpoint import restore_checkpoint, save_checkpoint
from ..training.train_step import (
    init_train_state,
    make_staged_train_step,
    make_staged_val_step,
    make_train_step,
    make_val_step,
)
from ..nn.extractor import model_init

_BATCH_KEYS = ("image0", "image1", "T_0to1", "K_color0", "K_color1", "Kori_color0", "Kori_color1")


class MicKeyTrainer:
    def __init__(self, cfg, out_dir: str = "weights/mickey_tpu", seed: int = 0, mesh=None):
        self.cfg = cfg
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

        self.mesh = mesh if mesh is not None else get_mesh()
        params = model_init(jax.random.PRNGKey(seed), cfg)
        # bootstrap the frozen backbone like the reference (auto-download or
        # local cache, mickey_extractor.py:14-17); random init if unavailable
        if cfg.MICKEY.DINOV2.get("VARIANT", "vit_large") == "vit_large":
            from ..training.checkpoint import convert_dinov2_state_dict, resolve_dinov2_weights

            dpath = resolve_dinov2_weights(download=bool(cfg.MICKEY.DINOV2.get("DOWNLOAD", True)))
            if dpath:
                from ..training.checkpoint import load_torch_state_dict

                params["dinov2"] = convert_dinov2_state_dict(load_torch_state_dict(dpath))
        state, backbone = init_train_state(cfg, params)
        self.state = replicate(self.mesh, state)
        # tensor-parallel backbone placement when the mesh has a 'model' axis
        self.backbone = shard_backbone(self.mesh, backbone)

        tp_mesh = self.mesh if mesh_tp(self.mesh) > 1 else None
        # staged (two-program) step by default: identical math, shares the
        # inference backbone program, measured faster than the monolith
        # (BENCHLOG round 3); cfg.TPU.STAGED_TRAIN=False restores one program
        make_step = (
            make_staged_train_step if cfg.TPU.get("STAGED_TRAIN", True) else make_train_step
        )
        self.train_step = make_step(cfg, mesh=tp_mesh)
        self.val_step = make_val_step(cfg, mesh=tp_mesh)
        # cached validation epoch (round 4): val pairs are keyframe-shared
        # (reference datasets/mapfree.py:55-58 — every pair of a scene reuses
        # the scene keyframe as frame0), and the backbone is frozen, so its
        # per-frame features are run-constant. When the loader provides frame
        # identity (scene_root + pair_names), validation_step extracts each
        # keyframe ONCE per run and only query frames pay the ViT forward —
        # roughly halving the val-epoch backbone cost vs the reference's
        # re-extract-both-sides validation_step (model.py:66-89). Identical
        # math (tests/test_training.py::test_val_cached_matches_plain).
        self._cached_val = bool(cfg.TPU.get("CACHED_VAL", True))
        self._staged_val = make_staged_val_step(cfg, mesh=tp_mesh)
        self._val_kf_cache = {}  # frame_key -> (Hp, Wp, C) device feature map
        from ..training.train_step import make_lr_fn

        self._lr_fn = make_lr_fn(cfg)  # reference LearningRateMonitor (train.py:57)
        self.key = jax.random.PRNGKey(seed + 1)

        # frozen-backbone feature cache (training/feature_cache.py): train
        # without the DINOv2 forward. Opened/built lazily in fit() (needs the
        # dataset); validated here so misconfiguration fails at construction.
        self.feature_cache = None
        self._cache_path = str(cfg.TPU.get("FEATURE_CACHE", "") or "")
        self._tp_mesh = tp_mesh
        if self._cache_path:
            if not cfg.TPU.get("STAGED_TRAIN", True):
                raise ValueError("TPU.FEATURE_CACHE requires TPU.STAGED_TRAIN")
            from ..training.feature_cache import check_cfg_cacheable

            check_cfg_cacheable(cfg)

        # curriculum (reference model.py:37-40)
        self.curriculum = cfg.LOSS_CLASS.CURRICULUM_LEARNING.TRAIN_CURRICULUM
        self.topk = float(cfg.LOSS_CLASS.CURRICULUM_LEARNING.TOPK_INIT)
        self.topk_max = float(cfg.LOSS_CLASS.CURRICULUM_LEARNING.TOPK)

        self.best = {"auc_vcre": -1.0, "auc_pose": -1.0}
        self.writer = None
        self.global_step = 0

    # -- logging ------------------------------------------------------------
    def _get_writer(self):
        if self.writer is None:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(os.path.join(self.out_dir, "tb"))
            except ImportError:
                self.writer = False
        return self.writer

    def log_scalar(self, name: str, value: float, step: Optional[int] = None):
        w = self._get_writer()
        if w:
            w.add_scalar(name, float(value), step if step is not None else self.global_step)

    def log_image(self, name: str, img_hwc: np.ndarray, step: Optional[int] = None):
        w = self._get_writer()
        if w:
            w.add_image(name, np.asarray(img_hwc), step if step is not None else self.global_step,
                        dataformats="HWC")

    # -- steps ---------------------------------------------------------------
    def _device_batch(self, batch: Dict) -> Dict:
        arrays = {k: batch[k] for k in _BATCH_KEYS if k in batch}
        n_dev = self.mesh.devices.size
        arrays, _ = pad_batch(arrays, n_dev)
        return jax.device_put(arrays, batch_sharding(self.mesh))

    def training_step(self, batch: Dict) -> Dict[str, float]:
        self.key, sk = jax.random.split(self.key)
        if self.feature_cache is not None:
            state, metrics = self._cached_step(batch, sk)
        else:
            db = self._device_batch(batch)
            state, metrics = self.train_step(
                self.state, self.backbone, db, sk, jnp.float32(self.topk)
            )
        self.state = state
        self.global_step += 1
        return {k: float(v) for k, v in metrics.items()}

    def _cached_step(self, batch: Dict, sk):
        """Train step on disk-cached frozen-backbone features: no backbone
        forward, no image host->device transfer (training/feature_cache.py).
        The loader's prefetch threads normally supply batch['fmap'] (overlap
        with compute); the inline gather is the fallback for hand-built
        batches."""
        from ..training.feature_cache import frame_key

        arrays = {
            k: batch[k] for k in _BATCH_KEYS
            if k in batch and k not in ("image0", "image1")
        }
        n_dev = self.mesh.devices.size
        arrays, real_b = pad_batch(arrays, n_dev)
        b_pad = next(iter(arrays.values())).shape[0]
        fmap = batch.get("fmap")
        if fmap is None:
            keys0 = [
                frame_key(sr, p[0])
                for sr, p in zip(batch["scene_root"], batch["pair_names"])
            ]
            keys1 = [
                frame_key(sr, p[1])
                for sr, p in zip(batch["scene_root"], batch["pair_names"])
            ]
            keys0 += keys0[-1:] * (b_pad - real_b)
            keys1 += keys1[-1:] * (b_pad - real_b)
            fmap = self.feature_cache.gather(keys0 + keys1)  # (2B, Hp, Wp, C)
        elif b_pad != real_b:  # pad both image0-rows and image1-rows halves
            f0, f1 = fmap[:real_b], fmap[real_b:]
            rep = np.repeat(f0[-1:], b_pad - real_b, axis=0)
            fmap = np.concatenate(
                [f0, rep, f1, np.repeat(f1[-1:], b_pad - real_b, axis=0)]
            )
        db = jax.device_put(arrays, batch_sharding(self.mesh))
        fmap = jax.device_put(fmap, batch_sharding(self.mesh))
        return self.train_step.grad_step(
            self.state, fmap, db, sk, jnp.float32(self.topk)
        )

    def validation_step(self, batch: Dict) -> Dict[str, np.ndarray]:
        real_b = batch["image0"].shape[0]
        self.key, sk = jax.random.split(self.key)
        if self._cached_val and "scene_root" in batch and "pair_names" in batch:
            out = self._validation_step_cached(batch, sk)
        else:
            db = self._device_batch(batch)
            out = self.val_step(self.state.params, self.backbone, db, sk)
        return {k: np.asarray(v)[:real_b] if np.asarray(v).ndim else np.asarray(v) for k, v in out.items()}

    def _validation_step_cached(self, batch: Dict, sk):
        """Validation with per-frame backbone-feature reuse (see __init__).

        Keyframe (frame0) features resolve through: in-memory per-run cache
        -> training disk feature cache (when one is open and holds the frame)
        -> one padded backbone pass over the batch's missing keyframes.
        Query (frame1) features resolve through the disk cache when it holds
        ALL of the batch's queries, else one backbone pass — queries are
        unique per pair, so they are never stored in the memory cache."""
        from ..training.feature_cache import frame_key

        arrays = {
            k: batch[k] for k in _BATCH_KEYS
            if k in batch and k not in ("image0", "image1")
        }
        n_dev = self.mesh.devices.size
        arrays, real_b = pad_batch(arrays, n_dev)
        b_pad = next(iter(arrays.values())).shape[0]
        sharding = batch_sharding(self.mesh)
        db = jax.device_put(arrays, sharding)
        bb_fwd = self._staged_val.backbone_fwd

        def pad_rows(x):
            return np.concatenate([x, np.repeat(x[-1:], b_pad - real_b, axis=0)])

        keys0 = [
            frame_key(sr, p[0])
            for sr, p in zip(batch["scene_root"], batch["pair_names"])
        ]
        keys1 = [
            frame_key(sr, p[1])
            for sr, p in zip(batch["scene_root"], batch["pair_names"])
        ]
        keys0 += keys0[-1:] * (b_pad - real_b)
        keys1 += keys1[-1:] * (b_pad - real_b)

        disk = self.feature_cache
        # One cfg-derived dtype for the whole stacked fmap regardless of
        # cache-hit pattern: disk rows and backbone outputs can differ (fp32
        # cache vs bf16 FLOAT16 backbone), and a mixed val_tail input dtype
        # means per-batch recompiles + metric drift (advisor round 4, low).
        val_dtype = (
            jnp.bfloat16 if self.cfg.MICKEY.DINOV2.get("FLOAT16", False) else jnp.float32
        )
        # query side: all-or-nothing from the disk cache (one program shape)
        if disk is not None and all(k in disk for k in keys1):
            q_feats = jnp.asarray(disk.gather(keys1), val_dtype)
        else:
            img1 = batch["image1"] if real_b == b_pad else pad_rows(batch["image1"])
            q_feats = bb_fwd(self.backbone, jax.device_put(img1, sharding)).astype(val_dtype)

        # keyframe side: per-frame resolution + one pass over the misses
        missing = [
            k for k in dict.fromkeys(keys0)
            if k not in self._val_kf_cache and not (disk is not None and k in disk)
        ]
        if missing:
            first_row = {k: keys0.index(k) for k in missing}
            img0 = np.stack([batch["image0"][first_row[k]] for k in missing])
            img0 = np.concatenate(
                [img0, np.repeat(img0[-1:], b_pad - len(missing), axis=0)]
            )
            feats = bb_fwd(self.backbone, jax.device_put(img0, sharding))
            for j, k in enumerate(missing):
                self._val_kf_cache[k] = feats[j]
            if len(self._val_kf_cache) > 2048:  # bound: ~1 keyframe/scene
                # Evict only entries the in-flight batch does not need: kf_row
                # below must still find this batch's keys (clearing them here
                # would send fresh extractions to the disk-cache fallback,
                # which lacks them by construction — advisor round 4, medium).
                keep = set(keys0)
                for k in [k for k in self._val_kf_cache if k not in keep]:
                    del self._val_kf_cache[k]

        def kf_row(k):
            if k in self._val_kf_cache:
                return self._val_kf_cache[k]
            return jnp.asarray(disk.gather([k])[0], val_dtype)

        kf_feats = jnp.stack([kf_row(k) for k in keys0]).astype(val_dtype)
        fmap = jax.device_put(
            jnp.concatenate([kf_feats, q_feats], axis=0), sharding
        )
        return self._staged_val(self.state.params, fmap, db, sk)

    def on_train_epoch_end(self):
        if self.curriculum:
            self.topk = min(self.topk_max, self.topk + 5)

    # -- epoch-end validation aggregation (reference model.py:205-280) --------
    def aggregate_validation(self, outputs) -> Dict[str, float]:
        agg = {k: np.concatenate([np.atleast_1d(o[k]) for o in outputs]) for k in outputs[0]}
        inliers = agg["inliers"].reshape(-1)

        res = {
            "val_loss/loss": float(np.mean(agg["loss"])),
            "val_loss/loss_R": float(np.mean(agg["avg_loss_rot"])),
            "val_loss/loss_t": float(np.mean(agg["avg_loss_trans"])),
            "val_metric_pose/ours_t_err_ang": float(np.mean(agg["t_err_ang"])),
            "val_metric_pose/ours_t_err_euc": float(np.mean(agg["t_err_euc"])),
            "val_metric_pose/ours_R_err": float(np.mean(agg["R_err"])),
            "val_vcre/metric_ours_vcre": float(np.mean(agg["vcre"])),
        }

        for t_th, r_th, tag in ((0.25, 5, ""), (0.5, 10, "_10")):
            ok = (agg["t_err_euc"].reshape(-1) < t_th) & (agg["R_err"].reshape(-1) < r_th)
            res[f"val_AUC_pose/prec_pose_ours{tag}"] = float(ok.mean())
            _, _, auc = precision_recall(inliers=inliers, tp=ok, failures=0)
            res[f"val_AUC_pose/auc_pose{tag}"] = float(auc)

        ok_vcre = agg["vcre"].reshape(-1) < 90
        res["val_vcre/prec_vcre_ours"] = float(ok_vcre.mean())
        _, _, auc_vcre = precision_recall(inliers=inliers, tp=ok_vcre, failures=0)
        res["val_vcre/auc_vcre"] = float(auc_vcre)
        return res

    # -- checkpointing (reference train.py:32-55 policies) --------------------
    def maybe_checkpoint(self, val_metrics: Dict[str, float], epoch: int):
        params_host = jax.device_get(self.state.params)
        opt_host = jax.device_get(self.state.opt_state)
        extra = {"topk": self.topk, "epoch": epoch}
        if val_metrics.get("val_vcre/auc_vcre", -1) > self.best["auc_vcre"]:
            self.best["auc_vcre"] = val_metrics["val_vcre/auc_vcre"]
            save_checkpoint(os.path.join(self.out_dir, "best_vcre"), params_host,
                            step=self.global_step, extra=extra)
        if val_metrics.get("val_AUC_pose/auc_pose", -1) > self.best["auc_pose"]:
            self.best["auc_pose"] = val_metrics["val_AUC_pose/auc_pose"]
            save_checkpoint(os.path.join(self.out_dir, "best_pose"), params_host,
                            step=self.global_step, extra=extra)
        save_checkpoint(os.path.join(self.out_dir, "last"), params_host,
                        step=self.global_step, opt_state=opt_host, extra=extra)

    def resume(self, path: str):
        like = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0,
            "extra": {"topk": 0.0, "epoch": 0},
        }
        restored = restore_checkpoint(path, like=like)
        self.state = self.state._replace(
            params=replicate(self.mesh, restored["params"]),
            opt_state=replicate(self.mesh, restored["opt_state"]),
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        self.global_step = int(restored["step"])
        self.topk = float(restored["extra"]["topk"])
        return int(restored["extra"]["epoch"])

    # -- TB image logging (reference tensorboard_log_step, model.py:149-196) ---
    def log_training_images(self, batch: Dict):
        """Log match / score-map / depth-map / reward panels for one pair.

        Only small tensors cross the device boundary: top-60 mutual matches,
        the (H/14, W/14) score/depth grids, and the REINFORCE sampling
        coefficients — the dense match matrix stays on device.
        """
        import jax.numpy as jnp

        from ..nn.extractor import compute_correspondences
        from ..nn.matcher import mutual_matches_device
        from ..training.loss import LossConfig, metric_pose_loss
        from ..utils.viz import colorize_depth, draw_matches, draw_reward_matches, prepare_score_map

        cfg = self.cfg
        lc = LossConfig.from_cfg(cfg)

        if not hasattr(self, "_viz_step"):
            @jax.jit
            def _viz_step(trainable, backbone, batch, key):
                params = dict(trainable, dinov2=backbone)
                corr, _ = compute_correspondences(
                    params, batch["image0"][:1], batch["image1"][:1], cfg, train=False
                )
                fs = corr.scores * corr.kp_scores
                rows, cols, msc = mutual_matches_device(fs[0])
                Rgt = batch["T_0to1"][:1, :3, :3]
                tgt = batch["T_0to1"][:1, :3, 3][:, None, :]
                _, aux = metric_pose_loss(
                    fs, corr.kps0, corr.depth0, corr.kps1, corr.depth1,
                    batch["K_color0"][:1], batch["K_color1"][:1],
                    batch["Kori_color0"][:1], batch["Kori_color1"][:1],
                    Rgt, tgt, key, lc, jnp.float32(100.0),
                )
                pts0 = jnp.take(corr.kps0[0], jnp.maximum(rows, 0), axis=0)
                pts1 = jnp.take(corr.kps1[0], jnp.maximum(cols, 0), axis=0)
                draw0 = aux["sampled_idx"][0, 0]  # (S,)
                samp0 = jnp.take(corr.kps0[0], draw0 // fs.shape[2], axis=0)
                samp1 = jnp.take(corr.kps1[0], draw0 % fs.shape[2], axis=0)
                # per-sample REINFORCE coefficient: sum over all draws that
                # contain the sample of (loss_i - baseline) — the reference's
                # "gradients" matrix restricted to draw-0 samples
                lv = aux["loss_value"][0] - jnp.mean(aux["loss_value"][0])  # (it,)
                membership = draw0[:, None, None] == aux["sampled_idx"][0][None, :, :]
                coeff = jnp.sum(membership * lv[None, :, None], axis=(1, 2))  # (S,)
                return {
                    "pts0": pts0, "pts1": pts1, "msc": msc, "rows": rows,
                    "scr0": corr.scr0[0], "scr1": corr.scr1[0],
                    "depth0": corr.depth_map0[0, :, :, 0], "depth1": corr.depth_map1[0, :, :, 0],
                    "samp0": samp0, "samp1": samp1, "coeff": coeff,
                }

            self._viz_step = _viz_step

        db = self._device_batch(batch)
        self.key, sk = jax.random.split(self.key)
        out = {k: np.asarray(v) for k, v in self._viz_step(
            self.state.params, self.backbone, db, sk
        ).items()}

        im0 = np.asarray(batch["image0"][0])
        im1 = np.asarray(batch["image1"][0])
        valid = out["rows"] >= 0
        if valid.any():
            self.log_image(
                "training_matching/best_matches_desc",
                draw_matches(im0, im1, out["pts0"][valid], out["pts1"][valid], out["msc"][valid]),
            )
        self.log_image("training_scores/map0", prepare_score_map(out["scr0"], im0)[:, :, ::-1] / 255.0)
        self.log_image("training_scores/map1", prepare_score_map(out["scr1"], im1)[:, :, ::-1] / 255.0)
        self.log_image("training_depth/map0", colorize_depth(out["depth0"])[:, :, :3] / 255.0)
        self.log_image("training_depth/map1", colorize_depth(out["depth1"])[:, :, :3] / 255.0)
        # reward panel: draw-0 samples colored by their REINFORCE coefficient
        self.log_image(
            "training_rewards/pair0",
            draw_reward_matches(im0, im1, out["samp0"], out["samp1"], out["coeff"]),
        )

    # -- full fit loop ---------------------------------------------------------
    def fit(self, datamodule, max_epochs: Optional[int] = None, val_batches: Optional[int] = None,
            log_interval: Optional[int] = None, resume_path: Optional[str] = None):
        cfg = self.cfg
        max_epochs = max_epochs or cfg.TRAINING.EPOCHS
        val_batches = val_batches or cfg.TRAINING.VAL_BATCHES
        log_interval = log_interval or cfg.TRAINING.LOG_INTERVAL

        start_epoch = self.resume(resume_path) if resume_path else 0
        train_loader = datamodule.train_dataloader()
        val_loader = datamodule.val_dataloader()

        if self._cache_path and self.feature_cache is None:
            from ..training.feature_cache import FeatureCache, build_feature_cache

            cache_dtype = str(cfg.TPU.get("FEATURE_CACHE_DTYPE", "bfloat16"))
            if FeatureCache.exists(self._cache_path):
                # validates the stored backbone fingerprint + dtype: a cache
                # built from different weights must not be silently reused
                self.feature_cache = FeatureCache(
                    self._cache_path, backbone=self.backbone, expect_dtype=cache_dtype
                )
            else:
                print(f"building feature cache at {self._cache_path}", flush=True)
                self.feature_cache = build_feature_cache(
                    cfg,
                    self.backbone,
                    train_loader.dataset,
                    self._cache_path,
                    dtype=cache_dtype,
                    log=lambda m: print(m, flush=True),
                    mesh=self._tp_mesh,
                )
            # hand the cache to the loader: feature rows are then gathered in
            # its prefetch worker threads (batch["fmap"]), overlapping the
            # disk reads with device compute instead of paying them inline
            train_loader.feature_cache = self.feature_cache

        for epoch in range(start_epoch, max_epochs):
            t_ep = time.time()
            for i, batch in enumerate(train_loader):
                metrics = self.training_step(batch)
                if self.global_step % log_interval == 0:
                    for k, v in metrics.items():
                        self.log_scalar(f"train/{k}", v)
                    self.log_scalar("train/topk", self.topk)
                    self.log_scalar("train/lr", float(self._lr_fn(self.global_step)))
                    if self.cfg.TPU.get("LOG_IMAGES", False) and "image0" in batch:
                        self.log_training_images(batch)
                    print(
                        f"epoch {epoch} step {self.global_step} "
                        f"loss {metrics['loss']:.4f} gnorm {metrics['grad_norm']:.2f}",
                        flush=True,
                    )
            self.on_train_epoch_end()

            # validation
            outputs = []
            for i, batch in enumerate(val_loader):
                if val_batches and i >= val_batches:
                    break
                outputs.append(self.validation_step(batch))
            if outputs:
                val_metrics = self.aggregate_validation(outputs)
                for k, v in val_metrics.items():
                    self.log_scalar(k, v)
                self.maybe_checkpoint(val_metrics, epoch)
                print(
                    f"epoch {epoch} done in {time.time()-t_ep:.0f}s "
                    f"val auc_vcre {val_metrics['val_vcre/auc_vcre']:.4f} "
                    f"auc_pose {val_metrics['val_AUC_pose/auc_pose']:.4f}",
                    flush=True,
                )
