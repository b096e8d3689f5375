"""Dump optimized HLO for FlowNet2 inference and summarize big copies/fusions.

Ad-hoc perf tool (round-4).  Usage: python scripts/dump_hlo.py [--out PATH]
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/flownet2_infer.hlo")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flownet2_tpu.models import get_model

    model = get_model("FlowNet2")
    B, H, W = args.batch, 384, 512
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32) * 255.0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)

    @jax.jit
    def step(variables, images, carry):
        out = model.apply(variables, images + carry)
        return jnp.mean(out) * 1e-24

    lowered = step.lower(variables, images, jnp.float32(0.0))
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt)} bytes)", file=sys.stderr)

    # summarize copies
    for m in re.finditer(r"^\s*(%?\S+) = (\S+) copy\((\S+)\)", txt, re.M):
        print("COPY", m.group(1)[:40], m.group(2), file=sys.stderr)


if __name__ == "__main__":
    main()
