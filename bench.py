"""Benchmark: FlowNet2 inference frames/s/chip at 384x512 (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against a fixed first-measurement anchor once recorded; until then 1.0.

Extra sub-metrics (per-model fps, train step/s) go to stderr for tracking.
"""

import json
import sys
import time

import numpy as np


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
    budget_s = float(__import__("os").environ.get("BENCH_BUDGET_S", 1800))
    for name, kwargs in (("FlowNet2", {}), ("FlowNet2S", {}),
                         ("FlowNet2C", {}),
                         ("FlowNet2-bf16", {"dtype": jnp.bfloat16})):
        if name != "FlowNet2" and time.perf_counter() - t_start > budget_s:
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

    value = results.get("FlowNet2", 0.0)
    print(json.dumps({
        "metric": "flownet2_inference_fps_384x512_b8_fp32",
        "value": round(value, 2),
        "unit": "frames/s/chip",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
