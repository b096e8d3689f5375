"""Train state + sharded, jitted train/eval steps.

Replaces the reference's train()/inference() loops (/root/reference/
main.py:246-340,343-405) with functional steps compiled once over the mesh:

- params replicated, batch sharded (data x spatial) — XLA inserts the
  gradient all-reduce over ICI; there is no hand-written collective
  (SURVEY.md §2.3 DP row).
- loss is computed inside the step (the reference fuses model+loss in
  ModelAndLoss so DataParallel scatters loss computation, main.py:163-181;
  under jit the same fusion falls out for free).
- mixed precision: params live in fp32, compute dtype is configurable
  (bf16 needs no loss scaling; an optional static ``loss_scale`` supports
  fp16-parity experiments, replacing main.py:280-291's master-weight copy
  machinery — optax states are the fp32 masters already).
- NaN guard: the reference asserts on NaN loss (main.py:278); here the
  step returns loss values for the host loop to check.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any = None

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=variables.get("batch_stats"),
        )

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


@dataclasses.dataclass
class StepFactory:
    """Builds jitted train/eval steps for (model, loss, tx) over a MeshPlan."""
    model: Any
    loss_fn: Any
    tx: optax.GradientTransformation
    plan: Any = None            # parallel.mesh.MeshPlan or None (single dev)
    loss_scale: float = 1.0     # static scale for fp16 parity experiments
    skip_nonfinite_updates: bool = False

    def init_state(self, rng, example_images) -> TrainState:
        variables = jax.jit(self.model.init)(rng, example_images)
        state = TrainState.create(variables, self.tx)
        if self.plan is not None:
            state = jax.device_put(state, self.plan.replicated)
        return state

    # ---- train ----
    def _train_step(self, state: TrainState, images, flow):
        def compute_loss(params):
            if state.batch_stats is not None:
                variables = {"params": params, "batch_stats": state.batch_stats}
                flows, updates = self.model.apply(
                    variables, images, training=True, train_bn=True,
                    mutable=["batch_stats"])
                new_stats = updates["batch_stats"]
            else:
                flows = self.model.apply({"params": params}, images,
                                         training=True)
                new_stats = None
            lossvalue, epevalue = self.loss_fn(flows, flow)
            return lossvalue * self.loss_scale, (epevalue, lossvalue, new_stats)

        grads, (epevalue, lossvalue, new_stats) = jax.grad(
            compute_loss, has_aux=True)(state.params)
        if self.loss_scale != 1.0:
            grads = jax.tree.map(lambda g: g / self.loss_scale, grads)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if self.skip_nonfinite_updates:
            # fp16-style robustness: reject the whole update on non-finite
            # grads (the reference instead asserts and dies, main.py:278)
            finite = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
            new_params = jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new_params, state.params)
            new_opt = jax.tree.map(
                lambda n, o: jnp.where(finite, n, o) if hasattr(n, "shape") else n,
                new_opt, state.opt_state)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            batch_stats=new_stats if new_stats is not None else state.batch_stats)
        metrics = {"loss": lossvalue, "epe": epevalue}
        return new_state, metrics

    def train_step(self) -> Callable:
        if self.plan is None:
            return jax.jit(self._train_step, donate_argnums=(0,))
        rep = self.plan.replicated
        return jax.jit(
            self._train_step,
            in_shardings=(rep, self.plan.batch_images, self.plan.batch_flow),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )

    # ---- eval ----
    def _metric_sums(self, pred, flow, n_valid):
        """Masked per-sample sums: drop_last=False loaders pad the tail
        batch back to full size (static shapes); positions >= n_valid are
        pad samples and must not contaminate the epoch means (the reference
        evaluates the full set, torch DataLoader drop_last default)."""
        loss_ps, epe_ps = self.loss_fn.per_sample(pred, flow)
        mask = (jnp.arange(loss_ps.shape[0]) < n_valid).astype(loss_ps.dtype)
        return {"loss_sum": jnp.sum(loss_ps * mask),
                "epe_sum": jnp.sum(epe_ps * mask),
                "count": jnp.asarray(n_valid, jnp.int32)}

    def _eval_step(self, state: TrainState, images, flow, n_valid):
        pred = self.model.apply(state.variables(), images, training=False)
        return self._metric_sums(pred, flow, n_valid)

    def eval_step(self) -> Callable:
        if self.plan is None:
            return jax.jit(self._eval_step)
        rep = self.plan.replicated
        return jax.jit(
            self._eval_step,
            in_shardings=(rep, self.plan.batch_images, self.plan.batch_flow,
                          rep),
            out_shardings=rep,
        )

    # ---- inference ----
    def infer_step(self) -> Callable:
        """Flow only (no targets)."""
        def _infer(state: TrainState, images):
            return self.model.apply(state.variables(), images, training=False)
        if self.plan is None:
            return jax.jit(_infer)
        return jax.jit(
            _infer,
            in_shardings=(self.plan.replicated, self.plan.batch_images),
        )

    def infer_metrics_step(self) -> Callable:
        """Flow + masked loss/EPE sums (the reference's inference loop
        reports per-batch losses, main.py:370-377 — targets are zeros when
        the dataset has no ground truth, main.py:370-372)."""
        def _infer(state: TrainState, images, flow, n_valid):
            pred = self.model.apply(state.variables(), images, training=False)
            return pred, self._metric_sums(pred, flow, n_valid)
        if self.plan is None:
            return jax.jit(_infer)
        rep = self.plan.replicated
        return jax.jit(
            _infer,
            in_shardings=(rep, self.plan.batch_images, self.plan.batch_flow,
                          rep),
        )
