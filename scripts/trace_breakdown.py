"""Bucketed device-trace breakdown of the FlowNet2 train step.

VERDICT r4 weak #4: the train-step's largest cost bucket (~67 of 110 ms)
was a single unitemized "everything else".  This tool splits it:

1. traces three jitted variants with jax.profiler — forward loss only,
   loss+grad, full step (grad+Adam) — so fwd / bwd / optimizer wall-time
   fall out as deltas;
2. parses the Perfetto trace json for the device track and buckets every
   device event by HLO-name patterns (convolution fwd/dgrad/kgrad are
   separately named in XLA, Pallas kernels are custom-calls, layout
   changes are copy/transpose/bitcast fusions);
3. prints the buckets and the top-N single events of the full step.

Usage: python scripts/trace_breakdown.py [--batch 8] [--h 384] [--w 448]
       [--dtype f32|bf16] [--top 25] [--model FlowNet2]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BUCKETS = [
    # (bucket, regex on event name) — first match wins
    ("pallas warp", re.compile(r"resample2d|warp", re.I)),
    ("pallas correlation", re.compile(r"correlation|corr_", re.I)),
    ("pallas other/custom", re.compile(r"custom-call|tpu_custom_call|mosaic",
                                       re.I)),
    ("conv kgrad", re.compile(r"convolution.*(filter|kgrad)|"
                              r"conv.*backward.*filter", re.I)),
    ("conv dgrad", re.compile(r"convolution.*(input|dgrad)|"
                              r"conv.*backward.*input", re.I)),
    ("conv fwd", re.compile(r"convolution|conv(?!ert)", re.I)),
    ("layout copy/transpose", re.compile(r"^copy|transpose|bitcast|"
                                         r"copy-start|copy-done", re.I)),
    ("reduce/scatter/gather", re.compile(r"reduce|scatter|gather|sort",
                                         re.I)),
    ("dynamic slice/update", re.compile(r"dynamic-?(update-?)?slice", re.I)),
    ("loop fusion (elementwise)", re.compile(r"loop_|^fusion", re.I)),
    ("other", re.compile(r".")),
]


def _device_events(tracedir):
    """[(name, dur_us)] for the TPU device track of the newest trace."""
    paths = sorted(glob.glob(os.path.join(
        tracedir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {tracedir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e.get("args", {}).get("name", ""))}
    out = []
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            out.append((e.get("name", "?"), float(e.get("dur", 0.0))))
    return out


def _bucket(events, iters):
    sums = collections.defaultdict(float)
    for name, dur in events:
        for bucket, rx in BUCKETS:
            if rx.search(name):
                sums[bucket] += dur / 1e3 / iters   # -> ms/iter
                break
    return sums


def _top_events(events, iters, n):
    per = collections.defaultdict(float)
    for name, dur in events:
        per[name] += dur / 1e3 / iters
    return sorted(per.items(), key=lambda kv: -kv[1])[:n]


def trace_fn(fn, args_, label, iters=10):
    """Run fn iters times under a profiler trace; returns (events, total_ms).
    """
    import jax

    fn(*args_)  # compile
    d = tempfile.mkdtemp(prefix=f"fn2trace_{label}_")
    jax.block_until_ready(args_)
    jax.profiler.start_trace(d)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args_)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / iters * 1e3
    jax.profiler.stop_trace()
    events = _device_events(d)
    dev_ms = sum(dur for _, dur in events) / 1e3 / iters
    print(f"[{label}] wall {wall:.2f} ms/iter, device-events sum "
          f"{dev_ms:.2f} ms/iter", file=sys.stderr)
    return events, dev_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=448)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--model", default="FlowNet2")
    ap.add_argument("--infer", action="store_true",
                    help="trace inference apply only (no loss/grad/Adam)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from flownet2_tpu.losses import MultiScale
    from flownet2_tpu.models import get_model
    from flownet2_tpu.train.state import StepFactory

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(args.batch, 2, args.h, args.w, 3)
                         .astype(np.float32) * 255.0)
    flow = jnp.asarray(rng.rand(args.batch, args.h, args.w, 2)
                       .astype(np.float32) * 5.0)
    model = get_model(args.model, **({"dtype": dtype} if dtype else {}))
    loss_fn = MultiScale()
    factory = StepFactory(model=model, loss_fn=loss_fn, tx=optax.adam(1e-4))
    state = factory.init_state(jax.random.PRNGKey(0), images)

    def loss(params, images, flow):
        outs = model.apply({"params": params, **({} if state.batch_stats is
                            None else {"batch_stats": state.batch_stats})},
                           images, train=True)
        val, _ = loss_fn(outs if isinstance(outs, (tuple, list)) else [outs],
                         flow)
        return val

    if args.infer:
        # inference-mode apply only (eval outputs, no loss/grad)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        apply = jax.jit(lambda v, i: model.apply(v, i))
        ev, ms = trace_fn(apply, (variables, images), "inference",
                          args.iters)
        print(f"\n== buckets: inference (device ms/iter, b{args.batch} "
              f"@{args.h}x{args.w} {args.dtype}) ==")
        for k, v in sorted(_bucket(ev, args.iters).items(),
                           key=lambda kv: -kv[1]):
            print(f"  {k:28s} {v:8.2f}")
        print(f"\n== top {args.top} single events (ms/iter) ==")
        for name, ms_ in _top_events(ev, args.iters, args.top):
            print(f"  {ms_:8.2f}  {name[:100]}")
        return

    fwd = jax.jit(lambda p, i, f: loss(p, i, f))
    grad = jax.jit(lambda p, i, f: jax.grad(loss)(p, i, f))
    step = factory.train_step()

    ev_fwd, ms_fwd = trace_fn(fwd, (state.params, images, flow), "fwd",
                              args.iters)
    ev_grad, ms_grad = trace_fn(grad, (state.params, images, flow),
                                "fwd+bwd", args.iters)
    ev_step, ms_step = trace_fn(lambda s: step(s, images, flow), (state,),
                                "full step", args.iters)

    print(f"\n== phase deltas (device ms/iter, b{args.batch} "
          f"@{args.h}x{args.w} {args.dtype}) ==")
    print(f"forward loss      : {ms_fwd:8.2f}")
    print(f"backward (delta)  : {ms_grad - ms_fwd:8.2f}")
    print(f"Adam+bookkeeping  : {ms_step - ms_grad:8.2f}")
    print(f"full step         : {ms_step:8.2f}")

    for label, ev in (("forward", ev_fwd), ("fwd+bwd", ev_grad),
                      ("full step", ev_step)):
        sums = _bucket(ev, args.iters)
        print(f"\n== buckets: {label} (ms/iter) ==")
        for k, v in sorted(sums.items(), key=lambda kv: -kv[1]):
            print(f"  {k:28s} {v:8.2f}")

    print(f"\n== top {args.top} single events, full step (ms/iter) ==")
    for name, ms in _top_events(ev_step, args.iters, args.top):
        print(f"  {ms:8.2f}  {name[:100]}")


if __name__ == "__main__":
    main()
