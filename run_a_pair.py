"""Single-pair demo: load a checkpoint, run FlowNet2 on two frames, save .flo.

Equivalent of the reference's run_a_pair.py (/root/reference/run_a_pair.py).

  python run_a_pair.py --model FlowNet2 \
      --checkpoint /ckpts/FlowNet2_checkpoint.pth.tar \
      img0.png img1.png --out flow.flo [--viz flow.png]
"""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("img0")
    p.add_argument("img1")
    p.add_argument("--model", default="FlowNet2")
    p.add_argument("--checkpoint", default="",
                   help=".pth.tar (torch) or native checkpoint dir; random "
                        "init if omitted")
    p.add_argument("--out", default="out.flo")
    p.add_argument("--viz", default="", help="also save a color-wheel PNG")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flownet2_tpu.data import read_gen, write_flo
    from flownet2_tpu.models import get_model

    im0 = read_gen(args.img0).astype(np.float32)
    im1 = read_gen(args.img1).astype(np.float32)
    h, w = im0.shape[:2]
    h64, w64 = (h // 64) * 64, (w // 64) * 64
    if (h64, w64) != (h, w):
        print(f"center-cropping {h}x{w} -> {h64}x{w64} (inputs must be /64)")
        y0, x0 = (h - h64) // 2, (w - w64) // 2
        im0 = im0[y0:y0 + h64, x0:x0 + w64]
        im1 = im1[y0:y0 + h64, x0:x0 + w64]
    pair = jnp.asarray(np.stack([im0, im1])[None])  # (1, 2, H, W, 3)

    model = get_model(args.model)
    if args.checkpoint.endswith(".pth.tar"):
        from flownet2_tpu.checkpoints import load_torch_checkpoint
        variables, meta = load_torch_checkpoint(args.checkpoint, args.model)
        print(f"loaded torch checkpoint: {meta}")
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), pair)
        if args.checkpoint:
            raise SystemExit("native checkpoint loading: use the CLI --resume")
        print("WARNING: random init (no --checkpoint)")

    flow = np.asarray(jax.jit(model.apply)(variables, pair))[0]
    write_flo(args.out, flow)
    print(f"wrote {args.out} ({flow.shape[1]}x{flow.shape[0]}, "
          f"max |flow| = {np.abs(flow).max():.2f})")
    if args.viz:
        from PIL import Image
        from flownet2_tpu.data import flow_to_image
        Image.fromarray(flow_to_image(flow)).save(args.viz)
        print(f"wrote {args.viz}")


if __name__ == "__main__":
    main()
