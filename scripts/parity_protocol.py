"""North-star parity protocol: released checkpoint -> Sintel EPE, both stacks.

Executes BASELINE.md's measurement protocol steps 1-2 with one command:

    python scripts/parity_protocol.py \
        --checkpoint /path/FlowNet2_checkpoint.pth.tar [--arch FlowNet2] \
        --sintel_root /path/MPI-Sintel/training [--dstype clean final] \
        [--n_batches 8] [--batch 4] [--with_reference] [--stagewise]

- ``--checkpoint`` accepts a released ``.pth.tar`` (torch state-dict,
  /root/reference/main.py:429-433) or a raw ``.caffemodel`` (parsed by
  checkpoints/caffe_import.py); the arch is inferred from the filename
  when ``--arch`` is omitted.
- EPE is the mean 2-norm of the flow residual, the reference's second loss
  value (/root/reference/losses.py:11-12,37-38), averaged per sample over
  the split with no samples dropped.
- ``--with_reference`` additionally runs the *reference* stack on CPU torch
  with the same weights (the CUDA ops replaced by the functional stubs in
  tests/ref_stubs.py) and reports the EPE delta — the parity verdict.
- ``--stagewise`` diffs activations at every sub-network boundary of the
  cascade (the models.py:120-185 seams: flownetc flow, flownets_1 flow,
  flownets_2 flow, flownetsd flow, fusion output) on one batch, for
  localising a parity failure.  Uses Flax capture_intermediates on our side
  and forward hooks on the reference side.

Output: the BASELINE.md-format markdown table on stdout plus a JSON line.

The MPI-Sintel data and released checkpoints are not in this environment;
tests/test_parity_protocol.py exercises the whole harness end-to-end on a
synthetic mini-Sintel tree and a randomly-initialised checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# Sub-network boundaries of each cascade (reference models.py:120-185):
# flax module name -> reference child-module name.
STAGE_MODULES = {
    "FlowNet2": [("flownetc", "flownetc"), ("flownets_1", "flownets_1"),
                 ("flownets_2", "flownets_2"), ("flownets_d", "flownets_d"),
                 ("flownetfusion", "flownetfusion")],
    "FlowNet2CSS": [("flownetc", "flownetc"), ("flownets_1", "flownets_1"),
                    ("flownets_2", "flownets_2")],
    "FlowNet2CS": [("flownetc", "flownetc"), ("flownets_1", "flownets_1")],
    "FlowNet2C": [("flownetc", "flownetc")],
    "FlowNet2S": [("flownets", "flownets")],
    "FlowNet2SD": [("flownetsd", "flownetsd")],
}


def load_variables(path: str, arch: str | None):
    """Checkpoint file -> (arch, flax variables)."""
    if path.endswith(".caffemodel"):
        from flownet2_tpu.checkpoints.caffe_import import (
            load_caffe_checkpoint, model_name_from_path)
        arch = arch or model_name_from_path(path)
        if arch is None:
            raise SystemExit(
                "--arch required: cannot infer the model from the filename")
        variables, _ = load_caffe_checkpoint(path, arch)
        return arch, variables
    from flownet2_tpu.checkpoints.torch_import import load_torch_checkpoint
    if arch is None:
        base = os.path.basename(path)
        for name in sorted(STAGE_MODULES, key=len, reverse=True):
            if name.replace("FlowNet2", "FlowNet2-") in base or name in base:
                arch = name
                break
        if arch is None:
            raise SystemExit(
                "--arch required: cannot infer the model from the filename")
    variables, _meta = load_torch_checkpoint(path, arch)
    return arch, variables


def sintel_batches(root: str, dstype: str, batch: int, n_batches: int):
    """Yield (images (B,2,H,W,3) f32, flow (B,H,W,2) f32, n_valid) batches
    over the full split at native render size (center-crop /64 snap,
    reference datasets.py:68-72)."""
    from flownet2_tpu.data.datasets import MpiSintel

    ds = MpiSintel(root=root, dstype=dstype)
    n = len(ds)
    done = 0
    for start in range(0, n, batch):
        if 0 <= n_batches <= done:
            return
        idx = list(range(start, min(start + batch, n)))
        n_valid = len(idx)
        samples = [ds[i] for i in idx]
        while len(samples) < batch:  # pad tail batch, masked by n_valid
            samples.append(samples[-1])
        images = np.stack([s[0] for s in samples])  # (B, 2, H, W, 3)
        flow = np.stack([s[1] for s in samples])
        yield images, flow, n_valid
        done += 1


def epe_tpu(arch, variables, batches):
    """Our stack: mean per-sample EPE over the split."""
    import jax
    import jax.numpy as jnp

    from flownet2_tpu.losses import epe_per_sample
    from flownet2_tpu.models import get_model

    model = get_model(arch)
    apply = jax.jit(lambda v, x: model.apply(v, x, training=False))

    total, count = 0.0, 0
    for images, flow, n_valid in batches:
        pred = apply(variables, jnp.asarray(images))
        ps = np.asarray(epe_per_sample(pred, jnp.asarray(flow)))[:n_valid]
        total += float(ps.sum())
        count += n_valid
    return total / max(count, 1)


def _reference_model(arch, state_dict):
    """Instantiate the reference torch model on CPU with the given weights
    (CUDA ops stubbed, tests/ref_stubs.py)."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "tests"))
    sys.path.insert(0, "/root/reference")
    import ref_stubs
    ref_stubs.install()
    import models as refmodels

    args = argparse.Namespace(fp16=False, rgb_max=255.0, grads={})
    tm = getattr(refmodels, arch)(args, batchNorm=False).eval()
    tm.load_state_dict({k: torch.as_tensor(np.asarray(v))
                        for k, v in state_dict.items()})
    return tm


def epe_reference(arch, state_dict, batches):
    """Reference stack (CPU torch + op stubs): mean per-sample EPE."""
    import torch

    tm = _reference_model(arch, state_dict)
    total, count = 0.0, 0
    for images, flow, n_valid in batches:
        x = torch.from_numpy(
            np.ascontiguousarray(images.transpose(0, 4, 1, 2, 3)))
        with torch.no_grad():
            pred = tm(x).numpy().transpose(0, 2, 3, 1)[:n_valid]
        err = np.sqrt(((pred - flow[:n_valid]) ** 2).sum(-1))
        total += float(err.reshape(n_valid, -1).mean(1).sum())
        count += n_valid
    return total / max(count, 1)


def stagewise_diff(arch, variables, state_dict, images):
    """Max-abs activation diff per sub-network boundary on one batch.

    Returns [(stage, max_abs_diff, ref_scale)] in cascade order; a parity
    failure shows up as the first stage whose diff is large relative to its
    scale."""
    import jax
    import jax.numpy as jnp
    import torch

    from flownet2_tpu.models import get_model

    model = get_model(arch)
    _, inter = model.apply(
        variables, jnp.asarray(images), training=False,
        capture_intermediates=lambda mdl, name: name == "__call__",
        mutable=["intermediates"])
    inter = inter["intermediates"]

    tm = _reference_model(arch, state_dict)
    ref_acts = {}

    def hook(name):
        def fn(_m, _inp, out):
            ref_acts[name] = out
        return fn

    for _flax_name, ref_name in STAGE_MODULES[arch]:
        getattr(tm, ref_name).register_forward_hook(hook(ref_name))
    with torch.no_grad():
        tm(torch.from_numpy(
            np.ascontiguousarray(images.transpose(0, 4, 1, 2, 3))))

    rows = []
    for flax_name, ref_name in STAGE_MODULES[arch]:
        ours = inter[flax_name]["__call__"][0]
        if isinstance(ours, tuple):  # training-tuple sub-nets: flow2 is [0]
            ours = ours[0]
        ref = ref_acts[ref_name]
        if isinstance(ref, (tuple, list)):
            ref = ref[0]
        ref = ref.numpy().transpose(0, 2, 3, 1)
        ours = np.asarray(ours)
        rows.append((ref_name, float(np.abs(ours - ref).max()),
                     float(np.abs(ref).max())))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True,
                    help=".pth.tar (torch) or .caffemodel")
    ap.add_argument("--arch", default=None,
                    help="FlowNet2 / FlowNet2C / ... (inferred if omitted)")
    ap.add_argument("--sintel_root", required=True,
                    help="MPI-Sintel training/ dir (contains clean/, final/, flow/)")
    ap.add_argument("--dstype", nargs="+", default=["clean", "final"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n_batches", type=int, default=-1,
                    help="-1 = whole split")
    ap.add_argument("--with_reference", action="store_true",
                    help="also run the reference stack (CPU) and report delta")
    ap.add_argument("--stagewise", action="store_true",
                    help="activation diff per sub-net boundary (1 batch)")
    ap.add_argument("--tolerance", type=float, default=0.05,
                    help="EPE delta (absolute) counted as parity")
    args = ap.parse_args(argv)

    arch, variables = load_variables(args.checkpoint, args.arch)
    state_dict = None
    if args.with_reference or args.stagewise:
        import torch
        if args.checkpoint.endswith(".caffemodel"):
            from flownet2_tpu.checkpoints.caffe_import import (
                caffe_to_state_dict, read_caffemodel)
            state_dict = caffe_to_state_dict(
                read_caffemodel(args.checkpoint), arch)
        else:
            ckpt = torch.load(args.checkpoint, map_location="cpu",
                              weights_only=False)
            state_dict = ckpt.get("state_dict", ckpt)

    print(f"# Parity protocol — {arch} ({args.checkpoint})\n")
    rows = []
    for dstype in args.dstype:
        batches = list(sintel_batches(args.sintel_root, dstype, args.batch,
                                      args.n_batches))
        ours = epe_tpu(arch, variables, batches)
        row = {"split": f"Sintel {dstype} (train)", "epe_tpu": ours}
        if args.with_reference:
            ref = epe_reference(arch, state_dict, batches)
            row["epe_ref"] = ref
            row["delta"] = ours - ref
            row["parity"] = abs(ours - ref) <= args.tolerance
        rows.append(row)

    if args.with_reference:
        print("| Split | EPE (reference) | EPE (TPU) | delta | parity |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['split']} | {r['epe_ref']:.4f} | {r['epe_tpu']:.4f} "
                  f"| {r['delta']:+.4f} | "
                  f"{'OK' if r['parity'] else 'FAIL'} |")
    else:
        print("| Split | EPE (TPU) |")
        print("|---|---|")
        for r in rows:
            print(f"| {r['split']} | {r['epe_tpu']:.4f} |")

    if args.stagewise:
        images, _flow, _n = next(sintel_batches(
            args.sintel_root, args.dstype[0], args.batch, 1))
        print("\n## Stagewise activation diff (batch 0, "
              f"{args.dstype[0]})\n")
        print("| Stage | max |ours - ref| | max |ref| |")
        print("|---|---|---|")
        for stage, diff, scale in stagewise_diff(arch, variables, state_dict,
                                                 images):
            print(f"| {stage} | {diff:.3e} | {scale:.3e} |")

    print()
    print(json.dumps({"arch": arch, "results": rows}))
    if args.with_reference and not all(r["parity"] for r in rows):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
