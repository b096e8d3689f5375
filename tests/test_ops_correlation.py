"""Correlation op: numpy golden model + impl cross-checks + VJP checks.

The numpy golden model below re-derives the reference CUDA semantics
(/root/reference/networks/correlation_package/correlation_cuda_kernel.cu:73-147)
independently of the JAX implementations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flownet2_tpu.ops import correlation
from flownet2_tpu.ops.correlation import _correlation_mxu, _correlation_shifts


def corr_numpy(f1, f2, pad, K, maxd, s1, s2):
    B, H, W, C = f1.shape
    d_rad = maxd // s2
    D = 2 * d_rad + 1
    k_rad = (K - 1) // 2
    b_rad = k_rad + maxd
    out_h = int(np.ceil((H + 2 * pad - 2 * b_rad) / s1))
    out_w = int(np.ceil((W + 2 * pad - 2 * b_rad) / s1))
    # generous padding so the centred (b_rad) windows always stay in bounds
    pp = pad + s1 + K
    f1p = np.pad(f1, ((0, 0), (pp, pp), (pp, pp), (0, 0)))
    f2p = np.pad(f2, ((0, 0), (pp, pp), (pp, pp), (0, 0)))
    off = pp - pad  # padded-coordinate origin shift
    nelems = K * K * C
    out = np.zeros((B, out_h, out_w, D * D), np.float64)
    for b in range(B):
        for y in range(out_h):
            for x in range(out_w):
                # centred definition (see _correlation_shifts docstring);
                # identical to the CUDA kernel for K=1 (b_rad == maxd)
                y1 = y * s1 + b_rad + off
                x1 = x * s1 + b_rad + off
                for tj in range(-d_rad, d_rad + 1):
                    for ti in range(-d_rad, d_rad + 1):
                        acc = 0.0
                        for j in range(-k_rad, k_rad + 1):
                            for i in range(-k_rad, k_rad + 1):
                                v1 = f1p[b, y1 + j, x1 + i]
                                v2 = f2p[b, y1 + tj * s2 + j, x1 + ti * s2 + i]
                                acc += float(np.dot(v1, v2))
                        tc = (tj + d_rad) * D + (ti + d_rad)
                        out[b, y, x, tc] = acc / nelems
    return out.astype(np.float32)


@pytest.fixture(scope="module")
def small_inputs():
    rng = np.random.RandomState(0)
    f1 = rng.randn(2, 8, 9, 6).astype(np.float32)
    f2 = rng.randn(2, 8, 9, 6).astype(np.float32)
    return f1, f2


def test_shifts_matches_numpy_flownet_params(small_inputs):
    f1, f2 = small_inputs
    # FlowNetC config scaled down: pad=maxd=4, K=1, s1=1, s2=2 -> 5x5=25 ch
    want = corr_numpy(f1, f2, 4, 1, 4, 1, 2)
    got = np.asarray(jax.jit(lambda a, b: _correlation_shifts(a, b, 4, 1, 4, 1, 2))(
        jnp.array(f1), jnp.array(f2)))
    assert got.shape == want.shape == (2, 8, 9, 25)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mxu_matches_numpy(small_inputs):
    f1, f2 = small_inputs
    want = corr_numpy(f1, f2, 4, 1, 4, 1, 2)
    got = np.asarray(jax.jit(lambda a, b: _correlation_mxu(a, b, 4, 1, 4, 1, 2))(
        jnp.array(f1), jnp.array(f2)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_general_params_kernel3_stride(small_inputs):
    f1, f2 = small_inputs
    # K=3 patch, output stride 2, asymmetric pad vs maxd
    want = corr_numpy(f1, f2, 3, 3, 2, 2, 1)
    got = np.asarray(jax.jit(lambda a, b: _correlation_shifts(a, b, 3, 3, 2, 2, 1))(
        jnp.array(f1), jnp.array(f2)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_public_op_default(small_inputs):
    f1, f2 = small_inputs
    want = corr_numpy(f1, f2, 4, 1, 4, 1, 2)
    got = np.asarray(jax.jit(lambda a, b: correlation(a, b, 4, 1, 4, 1, 2))(
        jnp.array(f1), jnp.array(f2)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_autodiff(small_inputs):
    f1, f2 = small_inputs
    f1, f2 = jnp.array(f1), jnp.array(f2)
    g = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 9, 25))

    def ref_fwd(a, b):
        return _correlation_shifts(a, b, 4, 1, 4, 1, 2)

    want1, want2 = jax.jit(lambda a, b, c: jax.vjp(ref_fwd, a, b)[1](c))(f1, f2, g)

    def op(a, b):
        return correlation(a, b, 4, 1, 4, 1, 2)

    got1, got2 = jax.jit(lambda a, b, c: jax.vjp(op, a, b)[1](c))(f1, f2, g)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-4, atol=1e-5)


def test_grad_finite_differences():
    rng = np.random.RandomState(2)
    f1 = jnp.array(rng.randn(1, 6, 6, 4).astype(np.float32))
    f2 = jnp.array(rng.randn(1, 6, 6, 4).astype(np.float32))

    @jax.jit
    def loss(a, b):
        return jnp.sum(correlation(a, b, 2, 1, 2, 1, 1) ** 2)

    from fd_utils import check_grad_fd
    check_grad_fd(loss, (f1, f2))
