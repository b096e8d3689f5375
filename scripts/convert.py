"""Convert an original FlowNet2 ``.caffemodel`` to a native checkpoint.

The TPU-stack equivalent of the reference's ``convert.py``
(/root/reference/convert.py:13-18: ``python convert.py <caffemodel>
<prototxt> <repo>``) — no pycaffe needed: the wire format is parsed
directly (checkpoints/caffe_import.py), the prototxt argument is obsolete
(layer tables are keyed by model name), and the output is an Orbax
checkpoint directory loadable by the trainer / ``run_a_pair.py``.

Usage:
    python scripts/convert.py FlowNet2_weights.caffemodel ./ckpts \
        [--model FlowNet2]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("caffemodel", help="path to the released .caffemodel")
    ap.add_argument("out_dir", help="directory to write the checkpoint into")
    ap.add_argument("--model", default=None,
                    help="model name; when omitted it is inferred from the "
                         "release DIRECTORY layout (a parent directory "
                         "named e.g. FlowNet2-CS/, as the download script "
                         "creates) — pass --model for a bare file")
    ap.add_argument("--tag", default=None,
                    help="checkpoint tag (default: <model>-caffe)")
    args = ap.parse_args(argv)

    from flownet2_tpu.checkpoints.caffe_import import (
        load_caffe_checkpoint, model_name_from_path)
    from flownet2_tpu.checkpoints.native import save_checkpoint

    name = args.model or model_name_from_path(args.caffemodel)
    if name is None:
        print("cannot infer the model from the filename; pass --model",
              file=sys.stderr)
        return 2
    variables, meta = load_caffe_checkpoint(args.caffemodel, name)
    tag = args.tag or f"{name}-caffe"
    path = save_checkpoint(args.out_dir, variables, epoch=0,
                           best_epe=meta["best_EPE"], tag=tag)
    n = sum(x.size for x in __import__("jax").tree.leaves(variables))
    print(json.dumps({"arch": name, "params": int(n), "checkpoint": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
