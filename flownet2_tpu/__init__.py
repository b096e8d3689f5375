"""flownet2_tpu — a TPU-native optical-flow framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NVIDIA/flownet2-pytorch (reference mounted at /root/reference):

- ``ops``          custom compute ops (correlation cost volume, flow warping,
                   channel norm) with pure-XLA and Pallas-TPU implementations
- ``nn``           conv/deconv building blocks (NHWC, Flax linen)
- ``models``       FlowNetS / FlowNetC / FlowNetSD / FlowNetFusion and the
                   FlowNet2 / CS / CSS cascades
- ``losses``       L1/L2/MultiScale losses + EPE metric
- ``data``         .flo / image IO, dataset index builders, device feeding
- ``checkpoints``  PyTorch-checkpoint importer + native checkpointing
- ``parallel``     device-mesh construction and sharded train/eval steps
- ``train``        optimizers, LR schedules, the training loop
- ``cli``          registry-driven command line mirroring the reference UX

Activations are NHWC (TPU-native), weights HWIO; the reference's NCHW/OIHW
checkpoints are transposed on import (see checkpoints/torch_import.py).
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
