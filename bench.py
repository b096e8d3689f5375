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


def time_fn(fn, *args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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
    for name in ("FlowNet2", "FlowNet2S", "FlowNet2C"):
        model = get_model(name)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)
        apply = jax.jit(model.apply)
        dt = time_fn(apply, variables, images)
        fps = batch / dt
        results[name] = fps
        print(f"{name}: {dt*1e3:.2f} ms/batch{batch} -> {fps:.1f} frames/s",
              file=sys.stderr)
        del variables

    value = results["FlowNet2"]
    print(json.dumps({
        "metric": "flownet2_inference_fps_384x512_b8_fp32",
        "value": round(value, 2),
        "unit": "frames/s/chip",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
