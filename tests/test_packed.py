"""Packed (space-to-depth) conv rewrites vs direct convs (nn/packed.py).

Each packed op must match the direct full-resolution conv exactly (up to
float reassociation, ~1e-5): these rewrites carry FlowNetFusion's and
FlowNetSD's full-res layers on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flownet2_tpu.nn import packed


def direct_conv(x, k, stride=1):
    pad = (k.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def tconv_dilated(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


class TestReps:
    def test_space_to_depth_roundtrip_via_staggered(self, rng):
        # aligned -> (fake) staggered -> full: build S from F directly and
        # check staggered_to_full inverts it.
        f = rand(rng, 2, 8, 12, 3)
        b, h2, w2, c = f.shape
        h, w = h2 // 2, w2 // 2
        fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
        groups = []
        for p in (0, 1):
            for q in (0, 1):
                # S[i, j] = F[2i - p, 2j - q] -> fp[2i - p + 1, 2j - q + 1]
                groups.append(fp[:, 1 - p:1 - p + 2 * h + 1:2,
                                 1 - q:1 - q + 2 * w + 1:2])
        s = jnp.concatenate(groups, axis=-1)
        out = packed.staggered_to_full(s, c)
        np.testing.assert_allclose(out, f, atol=0, rtol=0)

    def test_staggered_mask_zeroes_out_of_image(self, rng):
        s = jnp.ones((1, 4, 5, 8))  # h=3, w=4, c=2
        m = packed.staggered_mask(s, 2)
        # p=1 groups (channels 4..8) must be zero at row 0
        assert float(jnp.sum(jnp.abs(m[:, 0, :, 4:]))) == 0.0
        # p=0 groups zero at the last row
        assert float(jnp.sum(jnp.abs(m[:, -1, :, :4]))) == 0.0
        # q=1 groups (channels 2:4 and 6:8) zero at col 0
        assert float(jnp.sum(jnp.abs(m[:, :, 0, 2:4]))) == 0.0
        assert float(jnp.sum(jnp.abs(m[:, :, 0, 6:8]))) == 0.0
        # q=0 zero at last col
        assert float(jnp.sum(jnp.abs(m[:, :, -1, 0:2]))) == 0.0
        assert float(jnp.sum(jnp.abs(m[:, :, -1, 4:6]))) == 0.0


def full_to_staggered(f):
    """Reference staggered construction (masked), for feeding test inputs."""
    b, h2, w2, c = f.shape
    h, w = h2 // 2, w2 // 2
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    groups = []
    for p in (0, 1):
        for q in (0, 1):
            groups.append(fp[:, 1 - p:1 - p + 2 * h + 1:2,
                             1 - q:1 - q + 2 * w + 1:2])
    return jnp.concatenate(groups, axis=-1)


class TestPackedConvs:
    def test_conv_a2s(self, rng):
        f = rand(rng, 2, 12, 16, 5)
        k = rand(rng, 3, 3, 5, 7) * 0.1
        want = direct_conv(f, k)  # (2, 12, 16, 7) full res
        a = packed.space_to_depth(f)
        s = packed.conv_a2s(a, k)
        got = packed.staggered_to_full(packed.staggered_mask(s, 7), 7)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_conv_s2a(self, rng):
        f = rand(rng, 2, 12, 16, 5)
        k = rand(rng, 3, 3, 5, 6) * 0.1
        want = direct_conv(f, k)
        s = full_to_staggered(f)
        a = packed.conv_s2a(s, k)
        # unpack aligned: inverse of space_to_depth
        b, h, w, _ = a.shape
        got = a.reshape(b, h, w, 2, 2, 6).transpose(0, 1, 3, 2, 4, 5) \
            .reshape(b, 2 * h, 2 * w, 6)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_conv_s2_from_stag(self, rng):
        f = rand(rng, 2, 12, 16, 5)
        k = rand(rng, 3, 3, 5, 6) * 0.1
        want = direct_conv(f, k, stride=2)
        s = full_to_staggered(f)
        got = packed.conv_s2_from_stag(s, k)
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.parametrize("ksize", [3, 5, 7])
    def test_conv_s2_from_aligned(self, rng, ksize):
        f = rand(rng, 2, 16, 24, 4)
        k = rand(rng, ksize, ksize, 4, 6) * 0.1
        want = direct_conv(f, k, stride=2)
        a = packed.space_to_depth(f)
        got = packed.conv_s2_from_aligned(a, k)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_conv_a2f(self, rng):
        f = rand(rng, 2, 12, 16, 5)
        k = rand(rng, 3, 3, 5, 2) * 0.1
        want = direct_conv(f, k)
        a = packed.space_to_depth(f)
        got = packed.conv_a2f(a, k)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_tconv_to_staggered(self, rng):
        x = rand(rng, 2, 6, 8, 5)
        k = rand(rng, 4, 4, 5, 3) * 0.1
        want = tconv_dilated(x, k)  # (2, 12, 16, 3)
        s = packed.tconv_to_staggered(x, k)
        got = packed.staggered_to_full(packed.staggered_mask(s, 3), 3)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_chain_alternation(self, rng):
        """a2s -> s2a -> a2s chain == three direct convs (the Fusion L0
        pattern: conv0 (a2s) ... interconv0 (s2a), predict_flow0 (a2s))."""
        f = rand(rng, 1, 8, 12, 3)
        k1 = rand(rng, 3, 3, 3, 4) * 0.2
        k2 = rand(rng, 3, 3, 4, 5) * 0.2
        k3 = rand(rng, 3, 3, 5, 2) * 0.2
        want = direct_conv(direct_conv(direct_conv(f, k1), k2), k3)
        a = packed.space_to_depth(f)
        s = packed.staggered_mask(packed.conv_a2s(a, k1), 4)
        a2 = packed.conv_s2a(s, k2)
        s2 = packed.staggered_mask(packed.conv_a2s(a2, k3), 2)
        got = packed.staggered_to_full(s2, 2)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_bias_phase(self, rng):
        b = rand(rng, 6)
        bp = packed.bias_phase(b)
        assert bp.shape == (24,)
        np.testing.assert_allclose(np.asarray(bp[6:12]), np.asarray(b))
