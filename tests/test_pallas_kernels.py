"""Pallas TPU kernels validated on CPU via the Mosaic interpreter.

The real compile target is TPU (bench.py exercises that); these tests pin
the kernel *semantics* against the pure-XLA implementations using
``pltpu.force_tpu_interpret_mode`` so the suite stays hardware-free.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from flownet2_tpu.ops.resample2d import _resample2d_bilinear_impl
from flownet2_tpu.ops.resample2d_pallas import (
    resample2d_bilinear_pallas,
    supported,
)


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        (np.random.RandomState(seed).randn(*shape) * scale).astype(np.float32))


class TestResample2dPallas:
    B, H, W, C = 1, 16, 128, 3

    def _compare(self, flow_scale, seed):
        img = _rand((self.B, self.H, self.W, self.C), seed)
        flow = _rand((self.B, self.H, self.W, 2), seed + 1, flow_scale)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(resample2d_bilinear_pallas(img, flow))
        want = np.asarray(
            jax.jit(lambda i, f: _resample2d_bilinear_impl(i, f, 1))(img, flow))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_smooth_flow(self):
        self._compare(2.0, 0)

    def test_large_flow_crosses_blocks(self):
        self._compare(60.0, 2)  # whole-image displacements

    def test_zero_flow(self):
        img = _rand((self.B, self.H, self.W, self.C), 4)
        flow = jnp.zeros((self.B, self.H, self.W, 2))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(resample2d_bilinear_pallas(img, flow))
        np.testing.assert_allclose(got, np.asarray(img), rtol=1e-6, atol=1e-6)

    def test_supported_gate(self):
        ok = jnp.zeros((1, 16, 128, 3), jnp.float32)
        assert supported(ok, 1, True)
        assert not supported(ok, 2, True)          # tap window
        assert not supported(ok, 1, False)         # nearest
        assert not supported(jnp.zeros((1, 16, 100, 3)), 1, True)  # W % 128
        assert not supported(ok.astype(jnp.bfloat16), 1, True)     # dtype
