"""Pallas kernels x sharding (VERDICT r2 weak #3).

Pinned behaviors of ops/sharding_hints.py:

1. **Data-sharded mesh**: Pallas kernel call sites are wrapped in a
   data-axis ``jax.shard_map`` (the canonical distributed-Pallas
   composition) — the kernels run per-device on local batch shards; a
   sharded train step with the kernels force-enabled (Mosaic interpreter)
   matches the unsharded XLA step numerically.
2. **Spatial mesh**: dispatch provably never reaches a ``pallas_call`` —
   the XLA fallbacks (which GSPMD halo-partitions along H) are traced
   instead, and the step still runs to a finite loss.
3. No active mesh -> identity composition (the single-chip bench path).
"""

import importlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from flownet2_tpu.losses import MultiScale
from flownet2_tpu.models import FlowNet2CS
from flownet2_tpu.ops.sharding_hints import (
    kernel_wrapper,
    set_active_mesh,
    spatial_sharding_active,
)
from flownet2_tpu.parallel import MeshPlan, make_mesh
from flownet2_tpu.train import StepFactory, get_optimizer

# the package re-exports shadow the submodule names, so resolve via importlib
resample2d_mod = importlib.import_module("flownet2_tpu.ops.resample2d")

B, H, W = 8, 64, 128


def _batch(seed=0, b=B):
    rng = np.random.RandomState(seed)
    images = jnp.array(rng.rand(b, 2, H, W, 3).astype(np.float32) * 255.0)
    flow = jnp.array(rng.randn(b, H, W, 2).astype(np.float32) * 2)
    return images, flow


@pytest.fixture(autouse=True)
def _restore_dispatch():
    yield
    resample2d_mod.set_use_pallas(None)
    set_active_mesh(None, False)


def _factory(plan):
    # FlowNet2CS: exercises the correlation op (FlowNetC) and the warp
    # fwd + flow-grad kernels (the C->S1 glue) in one model.
    return StepFactory(FlowNet2CS(), MultiScale(),
                       get_optimizer("Adam", 1e-4), plan=plan)


def test_pallas_kernels_under_data_sharding():
    """Force the warp kernels into a data-sharded train step (interpret
    mode on the CPU mesh): the shard_map composition must produce the same
    loss and parameter update as the plain-XLA unsharded step.

    Runs on a 2-device data mesh with batch 2: the shard_map composition
    is identical at any device count, and the Mosaic interpreter makes
    per-sample cost high enough that the full 8-device/batch-8 variant
    took tens of minutes after the round-4 kernel work (paired planes
    double the interpreter's ref reads)."""
    images, flow = _batch(3, b=2)

    fac0 = _factory(None)
    state0 = fac0.init_state(jax.random.PRNGKey(0), images)
    new0, m0 = fac0.train_step()(jax.tree.map(jnp.copy, state0), images, flow)

    plan = MeshPlan(make_mesh(jax.devices()[:2], spatial=1))
    assert not spatial_sharding_active()
    resample2d_mod.set_use_pallas(True)
    fac = _factory(plan)
    state = jax.device_put(jax.tree.map(jnp.copy, state0), plan.replicated)
    im_s = jax.device_put(images, plan.batch_images)
    fl_s = jax.device_put(flow, plan.batch_flow)
    with pltpu.force_tpu_interpret_mode():
        new, m = fac.train_step()(state, im_s, fl_s)
        loss = float(m["loss"])

    assert np.isfinite(loss)
    assert loss == pytest.approx(float(m0["loss"]), rel=1e-4)
    worst = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(new0.params),
                        jax.tree.leaves(new.params)))
    # kernel path accumulates the warp flow-grad in a different (f32)
    # association than the XLA analytic backward; Adam's rsqrt amplifies
    # the few-ulp grad difference into ~2e-4 on params after one step
    assert worst < 5e-4


def test_spatial_mesh_step_runs_with_halo_warp(monkeypatch):
    """Under spatial sharding the full train step runs to a finite loss:
    the single-extent (non-rows) Pallas correlation kernels must never be
    reached — the op routes through the (data, spatial) halo-SLAB shard_map
    composition (ops/correlation_spatial.py) instead — and the warp routes
    through the halo-gather composition (ops/resample2d_spatial.py); the
    dispatch log is the evidence for both."""
    from flownet2_tpu.ops.sharding_hints import clear_dispatch_log, \
        dispatch_log

    calls = {"n": 0}
    cp = importlib.import_module("flownet2_tpu.ops.correlation_pallas")

    def _boom(*a, **k):
        calls["n"] += 1
        raise AssertionError("pallas_call reached under spatial sharding")

    monkeypatch.setattr(cp, "correlation_pallas", _boom)
    monkeypatch.setattr(cp, "correlation_pallas_bwd", _boom)

    plan = MeshPlan(make_mesh(spatial=2))
    assert spatial_sharding_active()
    clear_dispatch_log()

    images, flow = _batch(4, b=4)
    fac = _factory(plan)
    state = fac.init_state(jax.random.PRNGKey(1), images)
    im_s = jax.device_put(images, plan.batch_images)
    fl_s = jax.device_put(flow, plan.batch_flow)
    _, m = fac.train_step()(state, im_s, fl_s)
    assert np.isfinite(float(m["loss"]))
    assert calls["n"] == 0
    assert "halo-gather" in dispatch_log().get("resample2d", "")
    assert "halo-slab" in dispatch_log().get("correlation", "")


def test_spatial_halo_warp_matches_fallback_bitwise():
    """VERDICT r4 next #3 'done' criterion: the spatially-sharded warp
    composition matches the unsharded XLA path BITWISE (forward and flow
    gradient) on the CPU mesh — the row offset joins the integer-valued
    iota before the flow, so coordinates are identical."""
    rng = np.random.RandomState(7)
    B, Hh, Ww = 4, 64, 128
    img = jnp.asarray(rng.rand(B, Hh, Ww, 3).astype(np.float32))
    # large flows so samples cross the shard boundary in both directions
    flow = jnp.asarray(rng.randn(B, Hh, Ww, 2).astype(np.float32) * 30)

    ref = jax.jit(
        lambda i, f: resample2d_mod._resample2d_core(i, f, 1, True))(img, flow)
    ref_g = jax.jit(lambda i, f: jax.grad(
        lambda ff: jnp.sum(jnp.sin(
            resample2d_mod._resample2d_core(i, ff, 1, True))))(f))(img, flow)

    mesh = make_mesh(spatial=2)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", "spatial"))
    img_s = jax.device_put(img, spec)
    flow_s = jax.device_put(flow, spec)
    out = jax.jit(
        lambda i, f: resample2d_mod.resample2d(i, f, 1, True))(img_s, flow_s)
    g = jax.jit(lambda i, f: jax.grad(
        lambda ff: jnp.sum(jnp.sin(
            resample2d_mod.resample2d(i, ff, 1, True))))(f))(img_s, flow_s)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(ref_g))


def test_spatial_halo_warp_pallas_kernels_interpret():
    """The PALLAS kernels themselves (partial-rows grid) under the spatial
    composition: force-enable them in Mosaic interpreter mode on the CPU
    mesh and compare against the unsharded XLA path.  Proves the
    local-rows grid/offset plumbing, not just the XLA local fallback."""
    rng = np.random.RandomState(8)
    B, Hh, Ww = 2, 16, 128
    img = jnp.asarray(rng.rand(B, Hh, Ww, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(B, Hh, Ww, 2).astype(np.float32) * 6)

    ref = jax.jit(
        lambda i, f: resample2d_mod._resample2d_core(i, f, 1, True))(img, flow)
    ref_g = jax.jit(lambda i, f: jax.grad(
        lambda ff: jnp.sum(jnp.sin(
            resample2d_mod._resample2d_core(i, ff, 1, True))))(f))(img, flow)

    mesh = make_mesh(jax.devices()[:2], spatial=2)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", "spatial"))
    img_s = jax.device_put(img, spec)
    flow_s = jax.device_put(flow, spec)
    resample2d_mod.set_use_pallas(True)
    with pltpu.force_tpu_interpret_mode():
        out = jax.jit(lambda i, f: resample2d_mod.resample2d(
            i, f, 1, True))(img_s, flow_s)
        g = jax.jit(lambda i, f: jax.grad(
            lambda ff: jnp.sum(jnp.sin(resample2d_mod.resample2d(
                i, ff, 1, True))))(f))(img_s, flow_s)
        out, g = np.asarray(out), np.asarray(g)
    # kernel accumulates in a different association than the XLA lerp
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-6)
    np.testing.assert_allclose(g, np.asarray(ref_g), atol=2e-5)


def test_spatial_halo_correlation_matches_fallback():
    """The spatially-sharded correlation composition
    (ops/correlation_spatial.py) vs the unsharded op on the CPU mesh:
    forward and d_f1 BITWISE (the XLA slab fallback shares _mxu_padded
    with the unsharded banded-matmul path, so per-element arithmetic is
    identical and both stay shard-local); d_f2 crosses shards through the
    all_gather transpose's psum_scatter, so only its one cross-shard add
    association differs."""
    from flownet2_tpu.ops.correlation import correlation
    from flownet2_tpu.ops.sharding_hints import dispatch_log, \
        clear_dispatch_log

    rng = np.random.RandomState(11)
    b, hh, ww, c = 4, 16, 64, 8
    f1 = jnp.asarray(rng.randn(b, hh, ww, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, hh, ww, c).astype(np.float32))

    def loss(a, bb):
        return jnp.sum(jnp.sin(correlation(a, bb, 20, 1, 20, 1, 2)))

    ref = jax.jit(lambda a, bb: correlation(a, bb, 20, 1, 20, 1, 2))(f1, f2)
    rg1, rg2 = jax.jit(jax.grad(loss, argnums=(0, 1)))(f1, f2)

    mesh = make_mesh(spatial=2)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", "spatial"))
    f1s, f2s = jax.device_put(f1, spec), jax.device_put(f2, spec)
    clear_dispatch_log()
    out = jax.jit(lambda a, bb: correlation(a, bb, 20, 1, 20, 1, 2))(f1s, f2s)
    g1, g2 = jax.jit(jax.grad(loss, argnums=(0, 1)))(f1s, f2s)
    assert "halo-slab" in dispatch_log().get("correlation", "")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(rg1))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(rg2), atol=1e-5)


def test_spatial_halo_correlation_pallas_kernels_interpret():
    """The PALLAS rows kernels (correlation_pallas_rows / _bwd_rows) under
    the spatial composition: force-enable them in Mosaic interpreter mode
    on the CPU mesh and compare against the unsharded XLA path.  Proves
    the slab-coordinate grid/offset plumbing; tolerances are the kernels'
    bf16 matmul-operand rounding (same policy as the single-extent
    kernels, tests/test_pallas_kernels.py)."""
    from flownet2_tpu.ops import correlation_spatial
    from flownet2_tpu.ops.correlation import correlation
    from flownet2_tpu.ops.sharding_hints import dispatch_log, \
        clear_dispatch_log

    rng = np.random.RandomState(12)
    # W=96 exercises the WIDE (column-chunked) rows path: 96 + 2*20 > 128
    b, hh, ww, c = 1, 16, 96, 8
    f1 = jnp.asarray(rng.randn(b, hh, ww, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, hh, ww, c).astype(np.float32))

    def loss(a, bb):
        return jnp.sum(jnp.sin(correlation(a, bb, 20, 1, 20, 1, 2)))

    ref = jax.jit(lambda a, bb: correlation(a, bb, 20, 1, 20, 1, 2))(f1, f2)
    rg1, rg2 = jax.jit(jax.grad(loss, argnums=(0, 1)))(f1, f2)

    mesh = make_mesh(jax.devices()[:2], spatial=2)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", "spatial"))
    f1s, f2s = jax.device_put(f1, spec), jax.device_put(f2, spec)
    correlation_spatial.set_force_pallas(True)
    clear_dispatch_log()
    try:
        with pltpu.force_tpu_interpret_mode():
            out = jax.jit(
                lambda a, bb: correlation(a, bb, 20, 1, 20, 1, 2))(f1s, f2s)
            g1, g2 = jax.jit(jax.grad(loss, argnums=(0, 1)))(f1s, f2s)
            out, g1, g2 = np.asarray(out), np.asarray(g1), np.asarray(g2)
    finally:
        correlation_spatial.set_force_pallas(None)
    assert "pallas-rows" in dispatch_log().get("correlation", "")
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(g1, np.asarray(rg1), atol=3e-2, rtol=1e-2)
    np.testing.assert_allclose(g2, np.asarray(rg2), atol=3e-2, rtol=1e-2)


def test_spatial_halo_correlation_ragged_height_falls_back():
    """A height the spatial axis does not divide: the composition declines
    (with the rate-limited diagnostic) and the op still computes correctly
    through the XLA path under the active spatial mesh.  (An uneven
    device_put cannot even be constructed — this covers trace-time shapes
    GSPMD would reshard internally.)"""
    from flownet2_tpu.ops import sharding_hints
    from flownet2_tpu.ops.correlation import correlation

    rng = np.random.RandomState(13)
    f1 = jnp.asarray(rng.randn(4, 15, 32, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(4, 15, 32, 8).astype(np.float32))
    ref = jax.jit(lambda a, bb: correlation(a, bb, 4, 1, 4, 1, 2))(f1, f2)

    mesh = make_mesh(spatial=2)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    sharding_hints._WARNED_REASONS.clear()
    sharding_hints.clear_dispatch_log()
    out = jax.jit(lambda a, bb: correlation(a, bb, 4, 1, 4, 1, 2))(
        jax.device_put(f1, rep), jax.device_put(f2, rep))
    assert "halo-slab" not in sharding_hints.dispatch_log().get(
        "correlation", "")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_wrapper_modes():
    # no mesh -> identity
    set_active_mesh(None, False)
    w = kernel_wrapper(8)
    marker = object()
    assert w is not None and w(marker) is marker

    # data mesh -> shard_map (not identity)
    make_mesh(spatial=1)
    w = kernel_wrapper(8)
    assert w is not None
    assert w(lambda x: x) is not None

    # ragged batch the data axis does not divide -> fallback
    assert kernel_wrapper(3) is None

    # spatial mesh -> fallback
    make_mesh(spatial=2)
    assert kernel_wrapper(8) is None

    make_mesh(spatial=1)
    assert not spatial_sharding_active()


def test_fallback_warning_emitted(capsys):
    """kernel_wrapper fallbacks print ONE rate-limited diagnostic per
    reason (VERDICT r4 weak #6): silent 5-20x slowdowns are not OK."""
    from flownet2_tpu.ops import sharding_hints

    sharding_hints._WARNED_REASONS.clear()
    make_mesh(spatial=1)
    assert kernel_wrapper(3) is None          # ragged batch
    assert kernel_wrapper(3) is None          # repeated: no second line
    err = capsys.readouterr().err
    assert err.count("falling back to XLA") == 1
    assert "not divisible" in err

    sharding_hints._WARNED_REASONS.clear()
