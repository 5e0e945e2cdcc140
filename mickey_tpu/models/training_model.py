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
from ..parallel import batch_sharding, get_mesh, pad_batch, replicate, replicated
from ..training.checkpoint import restore_checkpoint, save_checkpoint
from ..training.train_step import init_train_state, make_train_step, make_val_step
from ..nn.extractor import model_init

_BATCH_KEYS = ("image0", "image1", "T_0to1", "K_color0", "K_color1", "Kori_color0", "Kori_color1")


class MicKeyTrainer:
    def __init__(self, cfg, out_dir: str = "weights/mickey_tpu", seed: int = 0, mesh=None):
        self.cfg = cfg
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

        self.mesh = mesh if mesh is not None else get_mesh()
        params = model_init(jax.random.PRNGKey(seed), cfg)
        state, backbone = init_train_state(cfg, params)
        self.state = replicate(self.mesh, state)
        self.backbone = replicate(self.mesh, backbone)

        self.train_step = make_train_step(cfg)
        self.val_step = make_val_step(cfg)
        self.key = jax.random.PRNGKey(seed + 1)

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
        db = self._device_batch(batch)
        self.key, sk = jax.random.split(self.key)
        self.state, metrics = self.train_step(
            self.state, self.backbone, db, sk, jnp.float32(self.topk)
        )
        self.global_step += 1
        return {k: float(v) for k, v in metrics.items()}

    def validation_step(self, batch: Dict) -> Dict[str, np.ndarray]:
        db = self._device_batch(batch)
        real_b = batch["image0"].shape[0]
        self.key, sk = jax.random.split(self.key)
        out = self.val_step(self.state.params, self.backbone, db, sk)
        return {k: np.asarray(v)[:real_b] if np.asarray(v).ndim else np.asarray(v) for k, v in out.items()}

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

        for epoch in range(start_epoch, max_epochs):
            t_ep = time.time()
            for i, batch in enumerate(train_loader):
                metrics = self.training_step(batch)
                if self.global_step % log_interval == 0:
                    for k, v in metrics.items():
                        self.log_scalar(f"train/{k}", v)
                    self.log_scalar("train/topk", self.topk)
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
