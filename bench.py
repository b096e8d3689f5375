"""Benchmark: FlowNet2 inference frames/s/chip at 384x512 (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against the first recorded measurement, persisted in
``BENCH_ANCHOR.json`` at the repo root (created on first run).

Extra sub-metrics go to stderr: per-model inference fps (fp32 + bf16) and
FlowNet2C / FlowNet2 train step/s (the reference's primary mode,
/root/reference/main.py:246-340).
"""

import json
import os
import sys
import time

import numpy as np

_ANCHOR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_ANCHOR.json")


def time_chained(apply, variables, images, iters=30, warmup=3):
    """Time jitted ``apply`` with a forced inter-iteration data dependency.

    On the axon-tunneled TPU, block_until_ready under-reports for fast
    graphs and a D2H fetch costs ~100 ms, so: chain each iteration's input
    on the previous output (can't be elided/overlapped), run the whole
    chain under one jit, fetch one scalar at the end, and amortise over
    ``iters``.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(variables, images, carry):
        out = apply(variables, images + carry)
        # scalar feedback; numerically ~0 but forces sequencing
        return jnp.mean(out) * 1e-24

    def run(n):
        carry = jnp.float32(0.0)
        for _ in range(n):
            carry = step(variables, images, carry)
        return float(carry)  # single fetch waits for the whole chain

    run(warmup)  # compile + warm
    t0 = time.perf_counter()
    run(1)
    overhead = time.perf_counter() - t0  # fetch + dispatch floor
    t0 = time.perf_counter()
    run(iters)
    total = time.perf_counter() - t0
    return max((total - overhead) / (iters - 1), 1e-9)


def time_train_step(step, state, images, flow, iters=15, warmup=3):
    """Time a jitted train step; steps chain naturally through the state,
    one loss fetch at the end syncs the chain."""
    def run(n, st):
        m = None
        for _ in range(n):
            st, m = step(st, images, flow)
        _ = float(m["loss"])
        return st

    st = run(warmup, state)
    t0 = time.perf_counter()
    st = run(1, st)
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    st = run(iters, st)
    total = time.perf_counter() - t0
    return max((total - overhead) / (iters - 1), 1e-9)


def bench_train(name, batch, h, w, results, label=None, dtype=None):
    import jax
    import jax.numpy as jnp
    import optax

    from flownet2_tpu.losses import MultiScale
    from flownet2_tpu.models import get_model
    from flownet2_tpu.train.state import StepFactory

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(batch, 2, h, w, 3).astype(np.float32) * 255.0)
    flow = jnp.asarray(rng.rand(batch, h, w, 2).astype(np.float32) * 5.0)
    kwargs = {"dtype": dtype} if dtype is not None else {}
    factory = StepFactory(model=get_model(name, **kwargs),
                          loss_fn=MultiScale(), tx=optax.adam(1e-4))
    state = factory.init_state(jax.random.PRNGKey(0), images)
    dt = time_train_step(factory.train_step(), state, images, flow)
    tag = label or f"{name}-train"
    results[tag] = batch / dt
    print(f"{tag}: {dt*1e3:.2f} ms/step b{batch} @ {h}x{w} "
          f"-> {batch/dt:.1f} frames/s", file=sys.stderr)


def scaling_table(model_name="FlowNet2C", per_device_batch=8, h=384, w=448,
                  device_counts=(1, 2, 4, 8), iters=10, train_iters=8):
    """Data-parallel scaling: frames/s at 1..N local devices with weak
    scaling (fixed per-device batch), plus efficiency vs linear, for BOTH
    inference and the full train step (BASELINE.md protocol step 4 names
    the primary mode — training; its psum'd gradients are what an
    efficiency number should stress).  Runs on however many devices the
    current backend exposes — the single real chip today, a v5e slice when
    one exists; tests exercise it on the 8-virtual-CPU mesh."""
    import jax
    import jax.numpy as jnp
    import optax

    from flownet2_tpu.losses import MultiScale
    from flownet2_tpu.models import get_model
    from flownet2_tpu.parallel import MeshPlan, scoped_mesh
    from flownet2_tpu.train.state import StepFactory

    ndev_avail = len(jax.devices())
    model = get_model(model_name)
    rng = np.random.RandomState(0)
    rows = []
    base = {}
    for ndev in device_counts:
        if ndev > ndev_avail:
            continue
        batch = per_device_batch * ndev
        images = jnp.asarray(
            rng.rand(batch, 2, h, w, 3).astype(np.float32) * 255.0)
        flow = jnp.asarray(rng.rand(batch, h, w, 2).astype(np.float32) * 5.0)
        with scoped_mesh(jax.devices()[:ndev], spatial=1) as mesh:
            plan = MeshPlan(mesh)
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)
            variables = jax.device_put(variables, plan.replicated)
            sh_images = jax.device_put(images, plan.batch_images)
            apply = jax.jit(model.apply,
                            in_shardings=(plan.replicated, plan.batch_images))
            dt = time_chained(lambda v, x: apply(v, x), variables, sh_images,
                              iters=iters)
            row = {"devices": ndev, "batch": batch}
            for mode, t in (("infer", dt),):
                fps = batch / t
                base.setdefault(mode, fps)
                eff = fps / (base[mode] * ndev)
                row["fps"] = round(fps, 1)
                row["efficiency"] = round(eff, 3)
                print(f"scaling {model_name} x{ndev}dev {mode}: "
                      f"{fps:8.1f} f/s (eff {eff * 100:5.1f}%)",
                      file=sys.stderr)
            del variables, apply
            factory = StepFactory(model=model, loss_fn=MultiScale(),
                                  tx=optax.adam(1e-4), plan=plan)
            state = factory.init_state(jax.random.PRNGKey(0), images)
            tdt = time_train_step(factory.train_step(), state, sh_images,
                                  jax.device_put(flow, plan.batch_flow),
                                  iters=train_iters)
            tfps = batch / tdt
            base.setdefault("train", tfps)
            teff = tfps / (base["train"] * ndev)
            row["train_fps"] = round(tfps, 1)
            row["train_efficiency"] = round(teff, 3)
            print(f"scaling {model_name} x{ndev}dev train: "
                  f"{tfps:8.1f} f/s (eff {teff * 100:5.1f}%)",
                  file=sys.stderr)
            del factory, state
        rows.append(row)
    return rows


def main():
    import jax
    import jax.numpy as jnp

    from flownet2_tpu.models import get_model

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    batch = 8
    h, w = 384, 512
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, 2, h, w, 3).astype(np.float32) * 255.0)

    results = {}
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1800))

    def budget_left():
        return budget_s - (time.perf_counter() - t_start)

    for name, kwargs in (("FlowNet2", {}), ("FlowNet2S", {}),
                         ("FlowNet2C", {}),
                         ("FlowNet2-bf16", {"dtype": jnp.bfloat16})):
        if name != "FlowNet2" and budget_left() < 120:
            print(f"{name}: skipped (budget)", file=sys.stderr)
            continue
        try:
            model = get_model(name.split("-")[0], **kwargs)
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)
            dt = time_chained(model.apply, variables, images)
            fps = batch / dt
            results[name] = fps
            print(f"{name}: {dt*1e3:.2f} ms/batch{batch} -> {fps:.1f} frames/s",
                  file=sys.stderr)
            del variables
        except Exception as e:  # keep the headline JSON alive
            print(f"{name}: FAILED {e}", file=sys.stderr)

    # Train-step sub-metrics (width 448: divisible by 64, fits VMEM paths).
    # These run BEFORE the wide-resolution entry: the train step is the
    # round-over-round perf metric and must not be budget-starved.
    for name, need, kw in (("FlowNet2C", 120, {}), ("FlowNet2", 400, {}),
                           # bf16 train tracked so the measured f32-beats-
                           # bf16 regression (docs/PERF_r04.md precision
                           # table) stays visible round over round
                           ("FlowNet2", 300,
                            {"dtype": jnp.bfloat16,
                             "label": "FlowNet2-train-bf16"})):
        if budget_left() < need:
            print(f"{name} train: skipped (budget)", file=sys.stderr)
            continue
        try:
            bench_train(name, batch, 384, 448, results, **kw)
        except Exception as e:
            print(f"{name} train: FAILED {e}", file=sys.stderr)

    # Sintel-native resolution (436x1024 snaps to 384x1024): corr width 128
    # exercises the wide-W column-chunked correlation kernel on hardware
    # (the parity-protocol shape class; VERDICT r2 missing #2).  Both b4
    # (historical row) and b8: the r5 profiling found the apparent "wide
    # path overhead" is mostly a BATCH-4 penalty — XLA space-to-batch
    # converts every conv at batch < 8 through extra relayout copies, a
    # ~1.7x per-pixel cliff at ANY width (docs/PERF_r05.md) — while at
    # matched batch the width overhead is only ~1.08x per pixel.
    if budget_left() > 150:
        try:
            model = get_model("FlowNet2")
            for wb in (4, 8):
                wide = jnp.asarray(
                    rng.rand(wb, 2, 384, 1024, 3).astype(np.float32) * 255.0)
                variables = jax.jit(model.init)(jax.random.PRNGKey(0), wide)
                dt = time_chained(model.apply, variables, wide, iters=15)
                mpx = wb * 384 * 1024 / 1e6
                print(f"FlowNet2 @384x1024 b{wb} (Sintel-native, wide-corr "
                      f"kernel): {dt*1e3:.2f} ms/batch -> {wb/dt:.1f} "
                      f"frames/s ({dt*1e3/mpx:.1f} ms/Mpx)", file=sys.stderr)
                del variables
        except Exception as e:
            print(f"FlowNet2 @384x1024: FAILED {e}", file=sys.stderr)

    # Sintel-native TRAIN step: exercises the scatter d_f2 wide correlation
    # backward on hardware (VERDICT r3 missing #2 — previously the XLA
    # shift-loop fallback).
    if budget_left() > 400:
        try:
            bench_train("FlowNet2", 4, 384, 1024, results,
                        label="FlowNet2-train-sintel-native")
        except Exception as e:
            print(f"FlowNet2 train @384x1024: FAILED {e}", file=sys.stderr)

    scaling = []
    if budget_left() > 120:
        try:
            scaling = scaling_table()
        except Exception as e:
            print(f"scaling: FAILED {e}", file=sys.stderr)

    value = round(results.get("FlowNet2", 0.0), 2)
    vs_baseline = 1.0
    try:
        if os.path.exists(_ANCHOR_PATH):
            anchor = json.load(open(_ANCHOR_PATH))["value"]
            if anchor > 0:
                vs_baseline = round(value / anchor, 3)
        elif value > 0:
            with open(_ANCHOR_PATH, "w") as f:
                json.dump({"metric": "flownet2_inference_fps_384x512_b8_fp32",
                           "value": value,
                           "recorded": "first bench.py measurement"}, f)
    except Exception as e:
        print(f"anchor handling failed: {e}", file=sys.stderr)

    line = {
        "metric": "flownet2_inference_fps_384x512_b8_fp32",
        "value": value,
        "unit": "frames/s/chip",
        "vs_baseline": vs_baseline,
    }
    if scaling:
        line["scaling_data_parallel"] = scaling
    print(json.dumps(line))


if __name__ == "__main__":
    main()
