"""Capture a device trace of the FlowNet2 train step and print the per-op
rollup.  Ad-hoc perf tool (round-4 train work).

Usage: python scripts/profile_train.py [--iters N] [--h 384 --w 448]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from profile_inference import rollup  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=448)
    ap.add_argument("--trace_dir", default="/tmp/train_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from flownet2_tpu.losses import MultiScale
    from flownet2_tpu.models import get_model
    from flownet2_tpu.train.state import StepFactory

    B, H, W = args.batch, args.h, args.w
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32) * 255.0)
    flow = jnp.asarray(rng.rand(B, H, W, 2).astype(np.float32) * 5.0)
    factory = StepFactory(model=get_model("FlowNet2"), loss_fn=MultiScale(),
                          tx=optax.adam(1e-4))
    state = factory.init_state(jax.random.PRNGKey(0), images)
    step = factory.train_step()

    for _ in range(3):
        state, m = step(state, images, flow)
    float(m["loss"])

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            state, m = step(state, images, flow)
        float(m["loss"])

    rolled = rollup(args.trace_dir)
    if rolled is not None:
        _, total = rolled
        print(f"per-iter device time: {total / args.iters:.2f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
