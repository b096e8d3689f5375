"""ChannelNorm + upsample ops: golden checks against numpy/torch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flownet2_tpu.ops import (
    avg_pool,
    channel_norm,
    upsample_bilinear,
    upsample_nearest,
)


def _rand(shape, seed, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(np.float32)


class TestChannelNorm:
    def test_forward(self):
        x = _rand((2, 5, 6, 3), 0)
        want = np.sqrt((x ** 2).sum(-1, keepdims=True))
        got = np.asarray(channel_norm(jnp.array(x)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_backward_reference_formula(self):
        # grad_in = g * x / (out + 1e-9)  (channelnorm_kernel.cu:92-94)
        x = _rand((1, 4, 4, 3), 1)
        g = _rand((1, 4, 4, 1), 2)
        out = np.sqrt((x ** 2).sum(-1, keepdims=True))
        want = g * x / (out + 1e-9)
        _, vjp = jax.vjp(channel_norm, jnp.array(x))
        got = np.asarray(vjp(jnp.array(g))[0])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_no_nan_at_zero(self):
        x = jnp.zeros((1, 2, 2, 3))
        grad = jax.grad(lambda a: jnp.sum(channel_norm(a)))(x)
        assert np.isfinite(np.asarray(grad)).all()


class TestUpsample:
    def test_nearest_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = _rand((2, 3, 5, 4), 3)
        want = torch.nn.Upsample(scale_factor=4, mode="nearest")(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(upsample_nearest(jnp.array(x), 4))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_bilinear_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = _rand((2, 6, 7, 3), 4)
        want = torch.nn.Upsample(scale_factor=4, mode="bilinear")(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(upsample_bilinear(jnp.array(x), 4))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_bilinear_scale2_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = _rand((1, 4, 4, 2), 5)
        want = torch.nn.Upsample(scale_factor=2, mode="bilinear")(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(upsample_bilinear(jnp.array(x), 2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestAvgPool:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = _rand((2, 8, 12, 2), 6)
        want = torch.nn.AvgPool2d(4, 4)(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(avg_pool(jnp.array(x), 4))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestChannelNormMulti:
    """Packed multi-input channel norm == concat of per-input norms, values
    and (1e-9-guarded) gradients."""

    def test_matches_unpacked(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from flownet2_tpu.ops import channel_norm, channel_norm_multi

        rng = np.random.RandomState(0)
        xs = [jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32))
              for c in (2, 2, 3, 3)]
        got = channel_norm_multi(*xs)
        want = jnp.concatenate([channel_norm(x) for x in xs], -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

        def f_packed(*xs):
            return jnp.sum(channel_norm_multi(*xs) ** 2)

        def f_unpacked(*xs):
            return sum(jnp.sum(channel_norm(x) ** 2) for x in xs)

        gp = jax.grad(f_packed, argnums=tuple(range(4)))(*xs)
        gu = jax.grad(f_unpacked, argnums=tuple(range(4)))(*xs)
        for a, b in zip(gp, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_guard_at_zero(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from flownet2_tpu.ops import channel_norm_multi

        x = jnp.zeros((1, 4, 4, 2))
        g = jax.grad(lambda a: jnp.sum(channel_norm_multi(a, a + 1.0)))(x)
        assert np.isfinite(np.asarray(g)).all()
