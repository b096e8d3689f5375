"""Capture a jax.profiler device trace of FlowNet2 inference and print the
per-op time rollup.  Ad-hoc perf tool (round-4 inference work).

Usage: python scripts/profile_inference.py [--dtype f32|bf16|mixed] [--iters N]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rollup(trace_dir, min_ms=0.05):
    path = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not path:
        print("no trace found", file=sys.stderr)
        return
    with gzip.open(path[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find the device pid
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            n = e["args"].get("name", "")
            if "TPU" in n and "XLA" not in n:
                dev_pids.add(e["pid"])
    by_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # us -> ms
            by_op[name] += dur
            total += dur
    print(f"== device total {total:.2f} ms over all iters ==", file=sys.stderr)
    for name, ms in by_op.most_common(60):
        if ms < min_ms:
            break
        print(f"{ms:9.2f} ms  {name[:110]}", file=sys.stderr)
    return by_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16", "mixed"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trace_dir", default="/tmp/infer_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flownet2_tpu.models import get_model

    dtype = {"f32": None, "bf16": jnp.bfloat16, "mixed": "mixed"}[args.dtype]
    kwargs = {}
    if dtype is not None:
        kwargs["dtype"] = dtype
    model = get_model("FlowNet2", **kwargs)

    B, H, W = args.batch, 384, 512
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32) * 255.0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)

    @jax.jit
    def step(variables, images, carry):
        out = model.apply(variables, images + carry)
        return jnp.mean(out) * 1e-24

    carry = jnp.float32(0.0)
    for _ in range(3):
        carry = step(variables, images, carry)
    float(carry)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        carry = jnp.float32(0.0)
        for _ in range(args.iters):
            carry = step(variables, images, carry)
        float(carry)

    rolled = rollup(args.trace_dir)
    if rolled is not None:
        _, total = rolled
        print(f"per-iter device time: {total / args.iters:.2f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
