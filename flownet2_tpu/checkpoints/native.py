"""Native checkpointing (save/resume) via Orbax.

Keeps the reference checkpoint semantics (/root/reference/main.py:429-436,
utils/tools.py:138-143): per-epoch save, a ``*_model_best`` copy when the
validation EPE improves, and resume restoring epoch + weights — improved
by also persisting optimizer state (the reference drops it,
main.py:208-215, noted in SURVEY.md §5 as a deficiency).

Orbax handles multi-host coordination (single writer per host / atomic
renames), which is what the reference's torch.save could never do.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _ckpt_dir(base, tag):
    return os.path.join(os.fspath(base), tag)


def save_checkpoint(directory: str | os.PathLike, state: Any, epoch: int,
                    best_epe: float, is_best: bool = False,
                    tag: str = "train-checkpoint") -> str:
    """Save TrainState + metadata; optionally copy to ``model_best``."""
    import orbax.checkpoint as ocp

    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = pathlib.Path(_ckpt_dir(directory, tag)).absolute()
    if path.exists():
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, jax.device_get(state)))
    meta = {"epoch": int(epoch), "best_EPE": float(best_epe)}
    (path / "meta.json").write_text(json.dumps(meta))
    if is_best:
        best = pathlib.Path(_ckpt_dir(directory, "model_best")).absolute()
        if best.exists():
            shutil.rmtree(best)
        shutil.copytree(path, best)
    return str(path)


def restore_checkpoint(directory: str | os.PathLike,
                       state_template: Any,
                       tag: str = "train-checkpoint") -> Tuple[Any, dict]:
    """Restore a TrainState saved by ``save_checkpoint``.

    ``state_template`` supplies the tree structure/shapes (e.g. a freshly
    initialised TrainState).
    """
    import orbax.checkpoint as ocp

    path = pathlib.Path(_ckpt_dir(directory, tag)).absolute()
    if not path.exists():
        raise FileNotFoundError(f"no checkpoint at {path}")
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(state_template))
    meta = json.loads((path / "meta.json").read_text()) \
        if (path / "meta.json").exists() else {}
    return restored, meta
