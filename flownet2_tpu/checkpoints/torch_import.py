"""PyTorch-checkpoint importer: reference ``.pth.tar`` -> Flax variables.

The reference ships Caffe-converted checkpoints saved as
``{'arch', 'epoch', 'state_dict', 'best_EPE'}`` (/root/reference/main.py:429-433,
utils/tools.py:138-143).  State-dict keys follow the module tree, e.g.
``flownetc.conv1.0.weight`` (/root/reference/models.py:42-90) where the
trailing ``.0``/``.1`` index the Sequential built by conv()/i_conv()/deconv()
(/root/reference/networks/submodules.py:7-38).

Key structure handled here:

  <subnet.>conv*<.0>.{weight,bias}          Conv2d          -> <subnet>/conv*/conv
  <subnet.>conv*<.1>.{weight,bias,running_*} BatchNorm2d    -> .../bn (+batch_stats)
  <subnet.>inter_conv*.0.*                  Conv2d (i_conv) -> .../conv
  <subnet.>predict_flow*.{weight,bias}      bare Conv2d     -> .../conv
  <subnet.>deconv*.0.*                      ConvTranspose2d -> .../tconv
  <subnet.>upsampled_flow*.{weight,bias}    ConvTranspose2d -> .../tconv

Layout transforms:
  Conv2d          OIHW -> HWIO              (transpose 2,3,1,0)
  ConvTranspose2d IOHW -> flip(H,W) -> HWIO (our Deconv stores the flipped
                                             kernel; see nn/layers.py)

Single-net wrappers (FlowNet2S/C/SD) keep their modules at the torch root
(models.py:187-351) while this framework nests them under a named subnet —
``root_map`` supplies that prefix per model.
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

# Flax subnet name each torch root-level module tree maps into, per model.
ROOT_PREFIX = {
    "FlowNet2": None,        # torch keys already prefixed (flownetc., ...)
    "FlowNet2CS": None,
    "FlowNet2CSS": None,
    "FlowNet2C": "flownetc",
    "FlowNet2S": "flownets",
    "FlowNet2SD": "flownetsd",
}

_SUBNET_NAMES = ("flownetc", "flownets_1", "flownets_2", "flownets_d",
                 "flownetfusion", "flownets", "flownetsd")


def _is_transposed(module_name: str) -> bool:
    return module_name.startswith("deconv") or module_name.startswith("upsampled_flow")


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _tconv_kernel(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight is (in, out, kh, kw); our Deconv stores
    # the flipped kernel as HWIO so the op is a plain dilated conv.
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def state_dict_to_variables(
    state_dict: Mapping[str, Any],
    model_name: str,
    dtype: Any = np.float32,
) -> Dict[str, Any]:
    """Convert a reference torch state-dict into Flax ``variables``."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    root = ROOT_PREFIX.get(model_name)

    for key, tensor in state_dict.items():
        arr = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = key.split(".")
        if parts[0] in _SUBNET_NAMES:
            prefix: Tuple[str, ...] = (parts[0],)
            parts = parts[1:]
        elif root is not None:
            prefix = (root,)
        else:
            prefix = ()

        module = parts[0]
        rest = parts[1:]
        # Drop Sequential index, remembering whether it selected BatchNorm.
        is_bn = False
        if rest and rest[0].isdigit():
            is_bn = rest[0] == "1"
            rest = rest[1:]
        leaf = rest[0]

        if leaf == "num_batches_tracked":
            continue

        if is_bn:
            sub = prefix + (module, "bn")
            if leaf == "weight":
                put(params, sub + ("scale",), arr.astype(dtype))
            elif leaf == "bias":
                put(params, sub + ("bias",), arr.astype(dtype))
            elif leaf == "running_mean":
                put(batch_stats, sub + ("mean",), arr.astype(dtype))
            elif leaf == "running_var":
                put(batch_stats, sub + ("var",), arr.astype(dtype))
            else:
                raise KeyError(f"unhandled BN leaf in {key!r}")
            continue

        if _is_transposed(module):
            sub = prefix + (module, "tconv")
            if leaf == "weight":
                put(params, sub + ("kernel",), _tconv_kernel(arr).astype(dtype))
            elif leaf == "bias":
                put(params, sub + ("bias",), arr.astype(dtype))
            else:
                raise KeyError(f"unhandled leaf in {key!r}")
        else:
            sub = prefix + (module, "conv")
            if leaf == "weight":
                put(params, sub + ("kernel",), _conv_kernel(arr).astype(dtype))
            elif leaf == "bias":
                put(params, sub + ("bias",), arr.astype(dtype))
            else:
                raise KeyError(f"unhandled leaf in {key!r}")

    variables: Dict[str, Any] = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def load_torch_checkpoint(
    path: str | pathlib.Path,
    model_name: Optional[str] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference ``.pth.tar`` checkpoint.

    Returns (variables, meta) where meta carries {'arch', 'epoch',
    'best_EPE'} when present (main.py:429-433).
    """
    import torch

    blob = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        state_dict = blob["state_dict"]
        meta = {k: blob.get(k) for k in ("arch", "epoch", "best_EPE")}
    else:
        state_dict = blob
        meta = {}
    name = model_name or meta.get("arch") or "FlowNet2"
    return state_dict_to_variables(state_dict, name), meta


def assert_tree_matches(variables, expected_shapes) -> None:
    """Verify an imported tree has exactly the structure/shapes the model
    expects (catches silent key mismatches)."""
    import jax

    got = {tuple(k.key for k in path): tuple(v.shape)
           for path, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    want = {tuple(k.key for k in path): tuple(v.shape)
            for path, v in jax.tree_util.tree_flatten_with_path(expected_shapes)[0]}
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad = [k for k in set(want) & set(got) if want[k] != got[k]]
    if missing or extra or bad:
        raise ValueError(
            f"imported tree mismatch:\n missing={missing[:8]}\n "
            f"extra={extra[:8]}\n shape-mismatch="
            f"{[(k, got[k], want[k]) for k in bad[:8]]}")
