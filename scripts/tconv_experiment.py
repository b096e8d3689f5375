"""Measure FlowNet2 inference vs the tconv phase/dilated threshold.

Out-pixel counts in FlowNet2 @384x512: S/C/SD decoder deconvs <= 96x128
(12288 out-quarter..., i.e. 12288*... ) — thresholds of interest:
  inf    : all phase (round-3 behaviour)
  196608 : everything phase (same as inf here)
  49152  : Fusion deconv0 + upsampled_flow1_to_0 dilated
  12288*4: see values printed
  0      : all dilated
Usage: python scripts/tconv_experiment.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(apply, variables, images, iters=15):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(variables, images, carry):
        out = apply(variables, images + carry)
        return jnp.mean(out) * 1e-24

    def run(n):
        carry = jnp.float32(0.0)
        for _ in range(n):
            carry = step(variables, images, carry)
        return float(carry)

    run(3)
    t0 = time.perf_counter()
    run(1)
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(iters)
    total = time.perf_counter() - t0
    return max((total - overhead) / (iters - 1), 1e-9) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from flownet2_tpu.models import get_model
    from flownet2_tpu.nn import layers

    B, H, W = 8, 384, 512
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32) * 255.0)
    model = get_model("FlowNet2")
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)

    for thr in (1 << 30, 4 * 192 * 256, 4 * 96 * 128, 4 * 48 * 64, 0):
        layers.set_tconv_phase_max_pixels(thr)
        dt = timeit(model.apply, variables, images)
        print(f"phase_max_out_pixels={thr:>10d}: {dt:7.2f} ms/batch{B} "
              f"-> {B/dt*1e3:.1f} f/s", file=sys.stderr)


if __name__ == "__main__":
    main()
