"""Per-stage latency breakdown of FlowNet2 inference on the current backend.

Times each sub-network and each full-resolution glue op at the benchmark
shape (B=8, 384x512) to direct kernel-optimisation work.  Ad-hoc profiling
tool; bench.py remains the headline benchmark.

Usage: python scripts/breakdown.py [--dtype f32|bf16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=20):
    """Chained timing (axon's block_until_ready under-reports; see bench.py):
    each iteration's first arg depends on the previous output, one scalar
    fetch at the end waits for the whole chain."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, *a):
        out = fn(a[0] + carry, *a[1:])
        leaf = jax.tree.leaves(out)[0]
        return jnp.mean(leaf).astype(jnp.float32) * 1e-24

    def run(n):
        carry = jnp.float32(0.0)
        for _ in range(n):
            carry = step(carry, *args)
        return float(carry)

    run(3)  # compile + warm
    t0 = time.perf_counter()
    run(1)
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(iters)
    total = time.perf_counter() - t0
    return max((total - overhead) / (iters - 1), 1e-9) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--grad", action="store_true",
                    help="time forward+backward (sum-loss grad wrt params)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from flownet2_tpu.models.flownet_c import FlowNetC
    from flownet2_tpu.models.flownet_s import FlowNetS
    from flownet2_tpu.models.flownet_sd import FlowNetFusion, FlowNetSD
    from flownet2_tpu.models import FlowNet2
    from flownet2_tpu.ops import (channel_norm, correlation, resample2d,
                                  upsample_bilinear, upsample_nearest)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, H, W = args.batch, 384, 512
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def rand(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32))

    def report(name, ms):
        print(f"{name:34s} {ms:8.2f} ms", file=sys.stderr)

    # --- sub-networks ---------------------------------------------------
    def time_module(name, mod, *xs):
        # real init, not zeros: zero weights produce zero flows, which lets
        # the data-dependent warp kernels hit their best case and understate
        # the glue cost (bit us in round 3 — the train step was 2x the
        # module-sum until a real-flow profile was taken)
        var = jax.jit(mod.init)(key, *xs)
        if args.grad:
            def f(x0, *rest):
                def loss(v):
                    out = mod.apply(v, x0, *rest)
                    return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                               for o in jax.tree.leaves(out))
                return jax.grad(loss)(var)
        else:
            f = lambda x0, *rest: mod.apply(var, x0, *rest)  # noqa: E731
        report(name, timeit(f, *xs))

    x1 = rand((B, H, W, 3))
    x2 = rand((B, H, W, 3))
    x6 = rand((B, H, W, 6))
    x12 = rand((B, H, W, 12))
    x11 = rand((B, H, W, 11))
    pair = rand((B, 2, H, W, 3)) * 255.0

    time_module("FlowNetC", FlowNetC(False, dtype), x1, x2)
    time_module("FlowNetS(12ch)", FlowNetS(12, False, dtype), x12)
    time_module("FlowNetSD", FlowNetSD(False, dtype), x6)
    time_module("FlowNetFusion", FlowNetFusion(False, dtype), x11)
    time_module("FlowNet2 (full)", FlowNet2(False, dtype=dtype), pair)

    # --- glue ops at full resolution -------------------------------------
    flow = rand((B, H, W, 2)) * 8.0
    flow4 = rand((B, H // 4, W // 4, 2))
    f256 = rand((B, H // 8, W // 8, 256))

    report("resample2d (full res)",
           timeit(jax.jit(resample2d), x2, flow))
    report("channel_norm (full res)",
           timeit(jax.jit(channel_norm), x1))
    report("upsample_bilinear x4",
           timeit(jax.jit(lambda f: upsample_bilinear(f, 4)), flow4))
    report("upsample_nearest x4",
           timeit(jax.jit(lambda f: upsample_nearest(f, 4)), flow4))
    report("correlation (48x64x256)",
           timeit(jax.jit(correlation), f256, f256))

    from flownet2_tpu.models.flownet2 import normalize_pair
    report("normalize_pair",
           timeit(jax.jit(lambda p: normalize_pair(p, 255.0)), pair))


if __name__ == "__main__":
    main()
