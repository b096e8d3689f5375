"""Epoch driver: train -> validate -> checkpoint, plus inference.

Re-creates the reference's top-level loop (/root/reference/main.py:407-456):
per epoch, optionally run inference, validate every ``validation_frequency``
epochs (tracking best EPE), save checkpoints, then train.  Differences by
design: config object instead of the args god-object, optimizer state in
checkpoints, JSONL metrics instead of TensorboardX.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

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
    validation_n_batches: int = -1     # reference --validation_n_batches
    train_n_batches: int = -1          # reference --train_n_batches
                                       # (main.py:28): cap steps per epoch
    start_epoch: int = -1              # reference --start_epoch (main.py:25);
                                       # >=0 overrides the resumed epoch
    checkpoint_frequency: int = 1      # epochs between train-checkpoints
    log_frequency: int = 1             # steps between metric records
    save_dir: str = "./work"
    run_name: str = "run"
    nan_check: bool = True             # reference NaN assert (main.py:278)
    tensorboard: bool = False          # tfevents scalars+histograms
    histogram_frequency: int = 100     # steps between param histograms
    profile_steps: int = 0             # capture a jax.profiler trace over
                                       # this many early train steps


class Trainer:
    def __init__(self, factory, config: TrainerConfig):
        """factory: train.state.StepFactory."""
        self.factory = factory
        self.config = config
        # Multi-host: only process 0 owns the metric/TB/checkpoint files —
        # every-process writes would interleave/corrupt them (the reference
        # is single-process and has no such guard).
        self.is_writer = jax.process_index() == 0
        self.logger = MetricLogger(
            config.save_dir if self.is_writer else None, config.run_name)
        self._train_step = factory.train_step()
        self._eval_step = factory.eval_step()
        self.best_epe = float("inf")
        self.start_epoch = max(config.start_epoch, 0)
        self.global_step = 0
        self._profiling = False
        self._profiled = config.profile_steps <= 0
        # TensorBoard-compatible scalars + param histograms, matching the
        # reference's two train/validation SummaryWriters (main.py:228-229,
        # 315-327) — written by the dependency-free utils.tensorboard
        self.tb_train = self.tb_val = None
        if config.tensorboard and self.is_writer:
            import os
            from ..utils.tensorboard import SummaryWriter
            self.tb_train = SummaryWriter(
                os.path.join(config.save_dir, "train"))
            self.tb_val = SummaryWriter(
                os.path.join(config.save_dir, "validation"))

    def _maybe_profile(self, step_in_epoch: int):
        """--profile N: trace steps [1, 1+N) of the first epoch (step 0 is
        the compile step) into <save_dir>/profile as a Perfetto/TB trace."""
        import os
        if self._profiled and not self._profiling:
            return
        if not self._profiling and step_in_epoch == 1:
            jax.profiler.start_trace(
                os.path.join(self.config.save_dir, "profile"))
            self._profiling = True
            self._profile_stop = step_in_epoch + self.config.profile_steps
        elif self._profiling and step_in_epoch >= self._profile_stop:
            jax.profiler.stop_trace()
            self._profiling = False
            self._profiled = True
            print(f"  profile: trace written to "
                  f"{os.path.join(self.config.save_dir, 'profile')}")

    # -- checkpoint plumbing -------------------------------------------------
    def resume(self, state, path: Optional[str] = None):
        """Restore from ``path`` when given (either a run directory holding
        a ``train-checkpoint`` or a specific checkpoint directory such as
        ``<run>/model_best`` — the reference's ``--resume`` names a
        checkpoint, main.py:208-219), else from this run's save dir."""
        import os

        base = path or self.config.save_dir
        tag = "train-checkpoint"
        if path and not os.path.isdir(os.path.join(base, tag)):
            tag = None  # path IS the checkpoint directory
        state, meta = restore_checkpoint(base, state, tag=tag)
        # --start_epoch (when given) wins over the checkpoint's epoch, as in
        # the reference (main.py:211-212 only reads checkpoint['epoch'] when
        # the flag is at its default)
        self.start_epoch = (self.config.start_epoch
                            if self.config.start_epoch >= 0
                            else int(meta.get("epoch", 0)))
        self.best_epe = float(meta.get("best_EPE", float("inf")))
        self.global_step = int(np.asarray(state.step))
        return state

    # -- loops ---------------------------------------------------------------
    def train_epoch(self, state, loader: Iterable, epoch: int,
                    loss_labels=("loss", "EPE")):
        timer = IteratorTimer(loader)
        n = len(loader) if hasattr(loader, "__len__") else None
        last = {}
        cap = self.config.train_n_batches
        if cap >= 0 and n is not None:
            n = min(n, cap)
        for i, batch in enumerate(progress(timer, total=n,
                                           desc=f"train e{epoch}")):
            if cap >= 0 and i >= cap:
                break
            self._maybe_profile(i)
            state, metrics = self._train_step(state, batch.images, batch.flow)
            self.global_step += 1
            if self.global_step % self.config.log_frequency == 0:
                host = {k: float(v) for k, v in metrics.items()}
                host["load_s"] = timer.last_duration
                self.logger.log(self.global_step, "train", host)
                if self.tb_train is not None:
                    self.tb_train.add_scalars(host, self.global_step)
                last = host
            if (self.tb_train is not None
                    and self.global_step % self.config.histogram_frequency == 0):
                # reference: one histogram per named parameter
                # (main.py:322-327).  Gated independently of log_frequency
                # so the documented cadence holds even when the two
                # frequencies are not multiples of each other.
                flat = jax.tree_util.tree_flatten_with_path(
                    state.params)[0]
                for path, leaf in flat:
                    name = "/".join(
                        getattr(k, "key", str(k)) for k in path)
                    self.tb_train.add_histogram(
                        name, np.asarray(jax.device_get(leaf)),
                        self.global_step)
            if (self.config.nan_check and last
                    and not np.isfinite(last["loss"])):
                raise FloatingPointError(
                    f"non-finite training loss {last['loss']} at step "
                    f"{self.global_step} (reference asserts here too, "
                    "main.py:278)")
        if self._profiling:  # epoch shorter than the profile window
            jax.profiler.stop_trace()
            self._profiling, self._profiled = False, True
        return state, last

    def validate(self, state, loader: Iterable, epoch: int,
                 n_batches: int = -1):
        """Sample-weighted validation means: tail batches from a
        drop_last=False loader are padded; the step masks pad positions and
        returns per-batch sums + true counts, so every real sample counts
        exactly once (the reference evaluates the full set)."""
        loss_sum = epe_sum = 0.0
        count = 0
        n = len(loader) if hasattr(loader, "__len__") else None
        for i, batch in enumerate(progress(loader, total=n,
                                           desc=f"val e{epoch}")):
            if n_batches >= 0 and i >= n_batches:
                break
            n_valid = batch.n_valid if batch.n_valid is not None \
                else batch.images.shape[0]
            sums = self._eval_step(state, batch.images, batch.flow, n_valid)
            loss_sum += float(sums["loss_sum"])
            epe_sum += float(sums["epe_sum"])
            count += int(sums["count"])
        means = {"loss": loss_sum / max(count, 1),
                 "epe": epe_sum / max(count, 1), "n_samples": count}
        self.logger.log(self.global_step, "val", means)
        if self.tb_val is not None:
            self.tb_val.add_scalars(means, self.global_step)
        print("  validation:",
              format_dictionary_of_losses(means.keys(), means.values()))
        return means

    def fit(self, state, train_loader, val_loader=None,
            skip_training: bool = False, skip_validation: bool = False,
            inference_loader=None, render_validation: bool = False,
            render_dir: Optional[str] = None):
        cfg = self.config
        for epoch in range(self.start_epoch, cfg.total_epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)

            # --render_validation: write inference flows every validation
            # epoch (reference main.py:415-417)
            if (inference_loader is not None and render_validation
                    and epoch % cfg.validation_frequency == 0):
                self.inference(state, inference_loader,
                               save_flow_dir=render_dir)

            if val_loader is not None and not skip_validation and (
                    epoch % cfg.validation_frequency == 0):
                means = self.validate(state, val_loader, epoch,
                                      n_batches=cfg.validation_n_batches)
                epe = means.get("epe", float("inf"))
                is_best = epe < self.best_epe
                self.best_epe = min(self.best_epe, epe)
                # every process calls: Orbax's internal barriers require it;
                # only process 0 writes (checkpoints/native.py)
                save_checkpoint(cfg.save_dir, jax.device_get(state), epoch,
                                self.best_epe, is_best=is_best, tag="checkpoint")

            if skip_training:
                break

            state, last = self.train_epoch(state, train_loader, epoch)
            if epoch % cfg.checkpoint_frequency == 0:
                save_checkpoint(cfg.save_dir, jax.device_get(state), epoch + 1,
                                self.best_epe, tag="train-checkpoint")
        return state

    def inference(self, state, loader: Iterable,
                  save_flow_dir: Optional[str] = None,
                  n_batches: int = -1, visualize_dir: Optional[str] = None):
        """Reference inference() (main.py:343-405): forward each batch,
        reporting loss/EPE per batch (targets are zeros when the dataset
        has no GT, main.py:370-372), optionally writing .flo files
        (main.py:386-394) and PNG visualizations (--inference_visualize,
        main.py:396-399).  ``n_batches`` mirrors --inference_n_batches
        (main.py:52); -1 = whole set.  Returns (n_flows_written, means)."""
        from ..data.flow_io import flow_to_image, write_flo
        import os

        step = self.factory.infer_metrics_step()
        for d in (save_flow_dir, visualize_dir):
            if d:
                os.makedirs(d, exist_ok=True)
        n = 0
        loss_sum = epe_sum = 0.0
        count = 0
        total = len(loader) if hasattr(loader, "__len__") else None
        for i, batch in enumerate(progress(loader, total=total,
                                           desc="inference")):
            if n_batches >= 0 and i >= n_batches:
                break
            n_valid = batch.n_valid if batch.n_valid is not None \
                else batch.images.shape[0]
            flows, sums = step(state, batch.images, batch.flow, n_valid)
            loss_sum += float(sums["loss_sum"])
            epe_sum += float(sums["epe_sum"])
            count += int(sums["count"])
            if save_flow_dir or visualize_dir:
                # only this batch's real (unpadded) samples; multi-host
                # global arrays are gathered to every host first (a plain
                # np.asarray throws on non-fully-addressable arrays), and
                # only process 0 writes files
                if isinstance(flows, jax.Array) \
                        and not flows.is_fully_addressable:
                    from jax.experimental import multihost_utils
                    flows = multihost_utils.process_allgather(
                        flows, tiled=True)
                if not self.is_writer:
                    n += int(n_valid)
                    continue
                flows_np = np.asarray(flows)[:n_valid]
                for f in flows_np:
                    if save_flow_dir:
                        write_flo(
                            os.path.join(save_flow_dir, f"{n:06d}.flo"), f)
                    if visualize_dir:
                        from PIL import Image
                        Image.fromarray(flow_to_image(f)).save(
                            os.path.join(visualize_dir, f"{n:06d}.png"))
                    n += 1
            else:
                n += int(n_valid)
        means = {"loss": loss_sum / max(count, 1),
                 "epe": epe_sum / max(count, 1), "n_samples": count}
        self.logger.log(self.global_step, "inference", means)
        print("  inference:",
              format_dictionary_of_losses(means.keys(), means.values()))
        return n, means
