"""Flow losses and the EPE metric.

TPU-native re-design of /root/reference/losses.py.  Each loss is a pure
function batch -> [loss, epe] (the reference returns ``[lossvalue,
epevalue]``, losses.py:38,50,81-86) plus a ``loss_labels`` tuple used by
the metric logger (losses.py:33,45,70).

Flow layout is NHW2 (the reference's NCHW norm over dim=1 becomes a norm
over the trailing axis).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .ops import avg_pool

Array = jax.Array
FlowOutput = Union[Array, Tuple[Array, ...]]


def _mean_per_sample(x: Array) -> Array:
    """Mean over all axes but the batch axis -> (B,)."""
    return x.reshape(x.shape[0], -1).mean(axis=1)


def epe(pred: Array, target: Array) -> Array:
    """End-point error: mean L2 norm of the flow residual
    (/root/reference/losses.py:11-12)."""
    return jnp.sqrt(jnp.sum((target - pred) ** 2, axis=-1)).mean()


def epe_per_sample(pred: Array, target: Array) -> Array:
    """Per-sample EPE, (B,) — for masked validation averaging."""
    return _mean_per_sample(jnp.sqrt(jnp.sum((target - pred) ** 2, axis=-1)))


def l1(pred: Array, target: Array) -> Array:
    """Mean absolute error (/root/reference/losses.py:14-19)."""
    return jnp.abs(pred - target).mean()


def l1_per_sample(pred: Array, target: Array) -> Array:
    return _mean_per_sample(jnp.abs(pred - target))


def l2(pred: Array, target: Array) -> Array:
    """Mean L2 norm over the flow axis (/root/reference/losses.py:21-25)."""
    return jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1)).mean()


def l2_per_sample(pred: Array, target: Array) -> Array:
    return _mean_per_sample(jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1)))


@dataclasses.dataclass(frozen=True)
class L1Loss:
    """[L1, EPE] (/root/reference/losses.py:28-38)."""
    loss_labels = ("L1", "EPE")

    def __call__(self, output: FlowOutput, target: Array):
        output = output[0] if isinstance(output, tuple) else output
        return [l1(output, target), epe(output, target)]

    def per_sample(self, output: FlowOutput, target: Array):
        """([B] loss, [B] epe) — for masked (no-drop) validation."""
        output = output[0] if isinstance(output, tuple) else output
        return [l1_per_sample(output, target),
                epe_per_sample(output, target)]


@dataclasses.dataclass(frozen=True)
class L2Loss:
    """[L2, EPE] (/root/reference/losses.py:40-50)."""
    loss_labels = ("L2", "EPE")

    def __call__(self, output: FlowOutput, target: Array):
        output = output[0] if isinstance(output, tuple) else output
        return [l2(output, target), epe(output, target)]

    def per_sample(self, output: FlowOutput, target: Array):
        output = output[0] if isinstance(output, tuple) else output
        return [l2_per_sample(output, target),
                epe_per_sample(output, target)]


@dataclasses.dataclass(frozen=True)
class MultiScale:
    """Multi-scale training loss (/root/reference/losses.py:52-86).

    For tuple outputs (training mode): target is scaled by div_flow=0.05,
    average-pooled to each scale (startScale * 2**s), and per-scale
    L1/L2 + EPE are accumulated with weights l_weight / 2**s.
    For a single output: plain [loss, EPE] on full-res flow.
    """
    start_scale: int = 4
    num_scales: int = 5
    l_weight: float = 0.32
    norm: str = "L1"
    div_flow: float = 0.05

    @property
    def loss_labels(self):
        return ("MultiScale-" + self.norm, "EPE")

    def __call__(self, output: FlowOutput, target: Array):
        loss_fn = l1 if self.norm == "L1" else l2
        if isinstance(output, tuple):
            target = self.div_flow * target
            lossvalue = 0.0
            epevalue = 0.0
            for i, out in enumerate(output[:self.num_scales]):
                weight = self.l_weight / (2 ** i)
                target_i = avg_pool(target, self.start_scale * (2 ** i))
                epevalue += weight * epe(out, target_i)
                lossvalue += weight * loss_fn(out, target_i)
            return [lossvalue, epevalue]
        return [loss_fn(output, target), epe(output, target)]

    def per_sample(self, output: FlowOutput, target: Array):
        """([B] loss, [B] epe) — for masked (no-drop) validation."""
        loss_ps = l1_per_sample if self.norm == "L1" else l2_per_sample
        if isinstance(output, tuple):
            target = self.div_flow * target
            lossvalue = 0.0
            epevalue = 0.0
            for i, out in enumerate(output[:self.num_scales]):
                weight = self.l_weight / (2 ** i)
                target_i = avg_pool(target, self.start_scale * (2 ** i))
                epevalue += weight * epe_per_sample(out, target_i)
                lossvalue += weight * loss_ps(out, target_i)
            return [lossvalue, epevalue]
        return [loss_ps(output, target), epe_per_sample(output, target)]


LOSSES = {
    "L1Loss": L1Loss,
    "L2Loss": L2Loss,
    "MultiScale": MultiScale,
}


def get_loss(name: str, **kwargs):
    try:
        cls = LOSSES[name]
    except KeyError:
        raise KeyError(
            f"unknown loss {name!r}; available: {sorted(LOSSES)}") from None
    return cls(**kwargs)
