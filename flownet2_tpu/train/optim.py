"""Optimizers + LR schedule.

Mirrors the reference's select-torch.optim-by-name UX
(/root/reference/main.py:43,231-239) with an optax registry, and its step
schedule (utils/tools.py:131-136): every ``frequency`` iterations the LR is
divided by ``fraction``, floored at 1e-6.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class LRSchedule:
    """Step decay (utils/tools.py:131-136): lr / fraction^(step//freq),
    floor 1e-6.  frequency<=0 disables decay (main.py:57 default 0)."""
    base_lr: float
    frequency: int = 0
    fraction: float = 2.0
    floor: float = 1e-6

    def __call__(self, step):
        if self.frequency <= 0:
            return jnp.asarray(self.base_lr, jnp.float32)
        k = jnp.floor_divide(step, self.frequency)
        lr = self.base_lr / jnp.power(self.fraction, k.astype(jnp.float32))
        return jnp.maximum(lr, self.floor)


def _sched(lr, schedule: Optional[LRSchedule]):
    return schedule if schedule is not None else lr


OPTIMIZERS = {
    "Adam": lambda lr, sched=None, **kw: optax.adam(_sched(lr, sched), **kw),
    "AdamW": lambda lr, sched=None, **kw: optax.adamw(_sched(lr, sched), **kw),
    "SGD": lambda lr, sched=None, **kw: optax.sgd(_sched(lr, sched), **kw),
    "Momentum": lambda lr, sched=None, momentum=0.9, **kw: optax.sgd(
        _sched(lr, sched), momentum=momentum, **kw),
    "RMSprop": lambda lr, sched=None, **kw: optax.rmsprop(_sched(lr, sched), **kw),
    "Adagrad": lambda lr, sched=None, **kw: optax.adagrad(_sched(lr, sched), **kw),
}

# Underlying optax callables — introspected by the CLI to auto-expose
# constructor params as --optimizer_<param> flags, the way the reference
# reflects torch.optim signatures (utils/tools.py:69-82, main.py:69-82).
_OPTAX_FNS = {
    "Adam": optax.adam,
    "AdamW": optax.adamw,
    "SGD": optax.sgd,
    "Momentum": optax.sgd,
    "RMSprop": optax.rmsprop,
    "Adagrad": optax.adagrad,
}

# registry-level default overrides on top of the optax signature
_PARAM_OVERRIDES = {"Momentum": {"momentum": 0.9}}


def optimizer_param_defaults(name: str) -> dict:
    """{param: default} for an optimizer's tunable numeric/bool params
    (learning_rate and dtype-like args excluded)."""
    import inspect

    fn = _OPTAX_FNS[name]
    out = {}
    for pname, p in inspect.signature(fn).parameters.items():
        if pname == "learning_rate" or pname.endswith("dtype"):
            continue
        if isinstance(p.default, (bool, int, float)):
            out[pname] = p.default
    out.update(_PARAM_OVERRIDES.get(name, {}))
    return out


def get_optimizer(name: str, lr: float, schedule: Optional[LRSchedule] = None,
                  grad_clip: Optional[float] = None, **kwargs):
    """Build an optax transform; ``grad_clip`` mirrors --gradient_clip
    (main.py:296-297 torch clip_grad_norm on the whole model)."""
    try:
        factory = OPTIMIZERS[name]
    except KeyError:
        raise KeyError(
            f"unknown optimizer {name!r}; available: {sorted(OPTIMIZERS)}") from None
    tx = factory(lr, schedule, **kwargs)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
