"""Epoch driver: train -> validate -> checkpoint, plus inference.

Re-creates the reference's top-level loop (/root/reference/main.py:407-456):
per epoch, optionally run inference, validate every ``validation_frequency``
epochs (tracking best EPE), save checkpoints, then train.  Differences by
design: config object instead of the args god-object, optimizer state in
checkpoints, JSONL metrics instead of TensorboardX.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable, Optional

import jax
import numpy as np

from ..checkpoints.native import restore_checkpoint, save_checkpoint
from ..utils.tools import (
    IteratorTimer,
    MetricLogger,
    format_dictionary_of_losses,
    progress,
)


@dataclasses.dataclass
class TrainerConfig:
    total_epochs: int = 10000
    validation_frequency: int = 5
    checkpoint_frequency: int = 1      # epochs between train-checkpoints
    log_frequency: int = 1             # steps between metric records
    save_dir: str = "./work"
    run_name: str = "run"
    nan_check: bool = True             # reference NaN assert (main.py:278)


class Trainer:
    def __init__(self, factory, config: TrainerConfig):
        """factory: train.state.StepFactory."""
        self.factory = factory
        self.config = config
        self.logger = MetricLogger(config.save_dir, config.run_name)
        self._train_step = factory.train_step()
        self._eval_step = factory.eval_step()
        self.best_epe = float("inf")
        self.start_epoch = 0
        self.global_step = 0

    # -- checkpoint plumbing -------------------------------------------------
    def resume(self, state):
        state, meta = restore_checkpoint(self.config.save_dir, state)
        self.start_epoch = int(meta.get("epoch", 0))
        self.best_epe = float(meta.get("best_EPE", float("inf")))
        self.global_step = int(np.asarray(state.step))
        return state

    # -- loops ---------------------------------------------------------------
    def train_epoch(self, state, loader: Iterable, epoch: int,
                    loss_labels=("loss", "EPE")):
        timer = IteratorTimer(loader)
        n = len(loader) if hasattr(loader, "__len__") else None
        last = {}
        for batch in progress(timer, total=n, desc=f"train e{epoch}"):
            state, metrics = self._train_step(state, batch.images, batch.flow)
            self.global_step += 1
            if self.global_step % self.config.log_frequency == 0:
                host = {k: float(v) for k, v in metrics.items()}
                host["load_s"] = timer.last_duration
                self.logger.log(self.global_step, "train", host)
                last = host
                if self.config.nan_check and not np.isfinite(host["loss"]):
                    raise FloatingPointError(
                        f"non-finite training loss {host['loss']} at step "
                        f"{self.global_step} (reference asserts here too, "
                        "main.py:278)")
        return state, last

    def validate(self, state, loader: Iterable, epoch: int):
        totals, count = {}, 0
        n = len(loader) if hasattr(loader, "__len__") else None
        for batch in progress(loader, total=n, desc=f"val e{epoch}"):
            metrics = self._eval_step(state, batch.images, batch.flow)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
        means = {k: v / max(count, 1) for k, v in totals.items()}
        self.logger.log(self.global_step, "val", means)
        print("  validation:",
              format_dictionary_of_losses(means.keys(), means.values()))
        return means

    def fit(self, state, train_loader, val_loader=None,
            skip_training: bool = False):
        cfg = self.config
        for epoch in range(self.start_epoch, cfg.total_epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)

            if val_loader is not None and (
                    epoch % cfg.validation_frequency == 0):
                means = self.validate(state, val_loader, epoch)
                epe = means.get("epe_fullres", means.get("epe", float("inf")))
                is_best = epe < self.best_epe
                self.best_epe = min(self.best_epe, epe)
                save_checkpoint(cfg.save_dir, jax.device_get(state), epoch,
                                self.best_epe, is_best=is_best, tag="checkpoint")

            if skip_training:
                break

            state, last = self.train_epoch(state, train_loader, epoch)
            if epoch % cfg.checkpoint_frequency == 0:
                save_checkpoint(cfg.save_dir, jax.device_get(state), epoch + 1,
                                self.best_epe, tag="train-checkpoint")
        return state

    def inference(self, state, loader: Iterable, save_flow_dir: Optional[str] = None,
                  infer_step: Optional[Callable] = None):
        """Reference inference() (main.py:343-405): forward each batch,
        optionally writing .flo files."""
        from ..data.flow_io import write_flo
        import os

        step = infer_step or self.factory.infer_step()
        if save_flow_dir:
            os.makedirs(save_flow_dir, exist_ok=True)
        n = 0
        for batch in loader:
            flows = np.asarray(step(state, batch.images))
            if save_flow_dir:
                for f in flows:
                    write_flo(os.path.join(save_flow_dir, f"{n:06d}.flo"), f)
                    n += 1
        return n
