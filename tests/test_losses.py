"""Loss tests: golden values against a direct torch re-statement of
/root/reference/losses.py semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from flownet2_tpu.losses import L1Loss, L2Loss, MultiScale, epe


def _rand(shape, seed, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(np.float32)


def torch_epe(pred_nchw, tgt_nchw):
    import torch
    return torch.norm(tgt_nchw - pred_nchw, p=2, dim=1).mean().item()


def to_nchw(x):
    import torch
    return torch.from_numpy(x.transpose(0, 3, 1, 2))


def test_epe_matches_torch():
    pytest.importorskip("torch")
    p = _rand((2, 8, 8, 2), 0)
    t = _rand((2, 8, 8, 2), 1)
    want = torch_epe(to_nchw(p), to_nchw(t))
    got = float(epe(jnp.array(p), jnp.array(t)))
    assert abs(got - want) < 1e-5


def test_l1_l2_losses():
    p = _rand((2, 8, 8, 2), 2)
    t = _rand((2, 8, 8, 2), 3)
    l1v, e1 = L1Loss()(jnp.array(p), jnp.array(t))
    assert abs(float(l1v) - np.abs(p - t).mean()) < 1e-6
    l2v, e2 = L2Loss()(jnp.array(p), jnp.array(t))
    want_l2 = np.sqrt(((p - t) ** 2).sum(-1)).mean()
    assert abs(float(l2v) - want_l2) < 1e-6
    assert abs(float(e1) - float(e2)) < 1e-6  # both are EPE


def test_multiscale_matches_reference_math():
    """Re-derive losses.py:72-81 with numpy avg-pooling."""
    rng = np.random.RandomState(4)
    H, W = 64, 64
    target = rng.randn(1, H, W, 2).astype(np.float32)
    outputs = tuple(
        rng.randn(1, H // (4 * 2 ** s), W // (4 * 2 ** s), 2).astype(np.float32)
        for s in range(5))

    def np_avgpool(x, k):
        B, h, w, C = x.shape
        return x.reshape(B, h // k, k, w // k, k, C).mean(axis=(2, 4))

    tgt = 0.05 * target
    want_loss, want_epe = 0.0, 0.0
    for s in range(5):
        w_s = 0.32 / 2 ** s
        t_s = np_avgpool(tgt, 4 * 2 ** s)
        want_epe += w_s * np.sqrt(((outputs[s] - t_s) ** 2).sum(-1)).mean()
        want_loss += w_s * np.abs(outputs[s] - t_s).mean()

    got_loss, got_epe = MultiScale()(
        tuple(jnp.array(o) for o in outputs), jnp.array(target))
    assert abs(float(got_loss) - want_loss) < 1e-5
    assert abs(float(got_epe) - want_epe) < 1e-5


def test_multiscale_single_output_path():
    p = _rand((1, 16, 16, 2), 5)
    t = _rand((1, 16, 16, 2), 6)
    got_loss, got_epe = MultiScale()(jnp.array(p), jnp.array(t))
    assert abs(float(got_loss) - np.abs(p - t).mean()) < 1e-6
    assert abs(float(got_epe) - np.sqrt(((p - t) ** 2).sum(-1)).mean()) < 1e-5


def test_loss_labels():
    assert L1Loss().loss_labels == ("L1", "EPE")
    assert MultiScale(norm="L2").loss_labels == ("MultiScale-L2", "EPE")
