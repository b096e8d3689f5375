"""Minimal finite-difference gradient checker (jax.test_util is gone in 0.9)."""

import numpy as np
import jax
import jax.numpy as jnp


def check_grad_fd(loss_fn, args, eps=1e-3, atol=2e-2, rtol=2e-2, n_probe=24,
                  seed=0):
    """Compare reverse-mode grads of scalar ``loss_fn`` against central
    finite differences along ``n_probe`` random coordinates per argument."""
    grads = jax.jit(jax.grad(loss_fn, argnums=tuple(range(len(args)))))(*args)
    rng = np.random.RandomState(seed)
    for ai, (arg, grad) in enumerate(zip(args, grads)):
        flat = np.asarray(arg, np.float64).ravel()
        gflat = np.asarray(grad, np.float64).ravel()
        idxs = rng.choice(flat.size, size=min(n_probe, flat.size), replace=False)
        for idx in idxs:
            hi, lo = flat.copy(), flat.copy()
            hi[idx] += eps
            lo[idx] -= eps
            args_hi = list(args)
            args_lo = list(args)
            args_hi[ai] = jnp.asarray(hi.reshape(arg.shape), arg.dtype)
            args_lo[ai] = jnp.asarray(lo.reshape(arg.shape), arg.dtype)
            fd = (float(loss_fn(*args_hi)) - float(loss_fn(*args_lo))) / (2 * eps)
            got = gflat[idx]
            assert abs(got - fd) <= atol + rtol * abs(fd), (
                f"arg {ai} flat idx {idx}: grad {got} vs fd {fd}")
