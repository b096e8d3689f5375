"""Sharded training tests on the 8-virtual-device CPU mesh (SURVEY.md §4.4).

Checks: mesh construction, data-parallel gradient equivalence vs single
device, spatial (H) sharding compiling+running, LR schedule math, train
loop integration with checkpoint save/resume.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flownet2_tpu.losses import MultiScale
from flownet2_tpu.models import FlowNet2S
from flownet2_tpu.parallel import MeshPlan, make_mesh
from flownet2_tpu.train import LRSchedule, StepFactory, TrainState, get_optimizer

B, H, W = 8, 64, 64


def _batch(seed=0, b=B):
    rng = np.random.RandomState(seed)
    images = jnp.array(rng.rand(b, 2, H, W, 3).astype(np.float32) * 255.0)
    flow = jnp.array(rng.randn(b, H, W, 2).astype(np.float32) * 2)
    return images, flow


@pytest.fixture(scope="module")
def factory_single():
    model = FlowNet2S()
    tx = get_optimizer("Adam", 1e-4)
    return StepFactory(model, MultiScale(), tx, plan=None)


@pytest.fixture(scope="module")
def state_single(factory_single):
    images, _ = _batch()
    return factory_single.init_state(jax.random.PRNGKey(0), images)


def test_mesh_construction():
    mesh = make_mesh(spatial=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "spatial")
    with pytest.raises(ValueError):
        make_mesh(spatial=3)


def test_lr_schedule():
    sched = LRSchedule(base_lr=1e-3, frequency=10, fraction=2.0)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(9)) == pytest.approx(1e-3)
    assert float(sched(10)) == pytest.approx(5e-4)
    assert float(sched(25)) == pytest.approx(2.5e-4)
    assert float(sched(10**9)) == pytest.approx(1e-6)  # floor
    flat = LRSchedule(base_lr=1e-3, frequency=0)
    assert float(flat(12345)) == pytest.approx(1e-3)


def test_data_parallel_matches_single_device(factory_single, state_single):
    """One step on the 8-device data mesh == one step on a single device."""
    images, flow = _batch(1)

    new_single, m_single = factory_single.train_step()(
        jax.tree.map(jnp.copy, state_single), images, flow)

    plan = MeshPlan(make_mesh(spatial=1))
    factory = StepFactory(factory_single.model, MultiScale(),
                          factory_single.tx, plan=plan)
    state_sharded = jax.device_put(
        jax.tree.map(jnp.copy, state_single), plan.replicated)
    im_s = jax.device_put(images, plan.batch_images)
    fl_s = jax.device_put(flow, plan.batch_flow)
    new_sharded, m_sharded = factory.train_step()(state_sharded, im_s, fl_s)

    assert float(m_single["loss"]) == pytest.approx(
        float(m_sharded["loss"]), rel=1e-5)
    l1 = jax.tree.leaves(new_single.params)
    l2 = jax.tree.leaves(new_sharded.params)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(l1, l2))
    assert worst < 1e-5


def test_spatial_sharding_compiles_and_runs(factory_single, state_single):
    """data x spatial mesh: H-sharded batch, conv halos via GSPMD."""
    plan = MeshPlan(make_mesh(spatial=2))
    factory = StepFactory(factory_single.model, MultiScale(),
                          factory_single.tx, plan=plan)
    state = jax.device_put(jax.tree.map(jnp.copy, state_single), plan.replicated)
    images, flow = _batch(2, b=4)
    im_s = jax.device_put(images, plan.batch_images)
    fl_s = jax.device_put(flow, plan.batch_flow)
    new_state, metrics = factory.train_step()(state, im_s, fl_s)
    assert np.isfinite(float(metrics["loss"]))
    assert int(np.asarray(new_state.step)) == int(np.asarray(state_single.step)) + 1


def test_eval_step(factory_single, state_single):
    images, flow = _batch(3)
    b = images.shape[0]
    sums = factory_single.eval_step()(state_single, images, flow, b)
    assert set(sums) == {"loss_sum", "epe_sum", "count"}
    assert int(sums["count"]) == b
    assert np.isfinite(float(sums["epe_sum"]))

    # masking: n_valid=1 must equal the first sample scored alone
    alone = factory_single.eval_step()(
        state_single, images[:1], flow[:1], 1)
    masked = factory_single.eval_step()(state_single, images, flow, 1)
    np.testing.assert_allclose(float(masked["epe_sum"]),
                               float(alone["epe_sum"]), rtol=1e-5)
    assert int(masked["count"]) == 1


class _NoDropLoader:
    """5 samples at batch 2 -> batches with n_valid 2, 2, 1; the tail batch
    is padded with a wildly different sample so pad contamination of the
    means would be caught."""

    def __init__(self, n_samples=5, batch=2):
        self.items = [_batch(100 + i, b=1) for i in range(n_samples)]
        self.batch = batch
        self.n_samples = n_samples

    def __len__(self):
        return -(-self.n_samples // self.batch)

    def __iter__(self):
        import numpy as _np
        for b in range(len(self)):
            sel = [self.items[(b * self.batch + j) % self.n_samples]
                   for j in range(self.batch)]
            n_valid = min(self.batch, self.n_samples - b * self.batch)
            images = _np.concatenate([s[0] for s in sel])
            flow = _np.concatenate([s[1] for s in sel])
            if n_valid < self.batch:  # poison the pad slots
                flow = flow.copy()
                flow[n_valid:] += 1e3
            from flownet2_tpu.data.loader import Batch
            yield Batch(images, flow, n_valid)


def test_validate_scores_every_sample(tmp_path, factory_single, state_single):
    """VERDICT r1 weak #2: a 5-sample set at batch 2 scores exactly 5
    samples, and the padded slot does not contaminate the mean."""
    from flownet2_tpu.train import Trainer, TrainerConfig

    trainer = Trainer(factory_single, TrainerConfig(save_dir=str(tmp_path)))
    loader = _NoDropLoader()
    means = trainer.validate(state_single, loader, epoch=0)
    assert means["n_samples"] == 5

    # oracle: score each sample alone
    eval_step = factory_single.eval_step()
    total = 0.0
    for images, flow in loader.items:
        total += float(eval_step(state_single, images, flow, 1)["epe_sum"])
    np.testing.assert_allclose(means["epe"], total / 5, rtol=1e-5)


def test_inference_writes_every_sample(tmp_path, factory_single,
                                       state_single):
    """Inference writes one .flo + one .png per real sample (not per padded
    slot), reports masked EPE, and honors n_batches."""
    from flownet2_tpu.train import Trainer, TrainerConfig

    trainer = Trainer(factory_single, TrainerConfig(save_dir=str(tmp_path)))
    flo_dir = str(tmp_path / "flows")
    viz_dir = str(tmp_path / "viz")
    n, means = trainer.inference(state_single, _NoDropLoader(),
                                 save_flow_dir=flo_dir,
                                 visualize_dir=viz_dir)
    assert n == 5
    assert means["n_samples"] == 5
    import os
    assert sorted(os.listdir(flo_dir)) == [f"{i:06d}.flo" for i in range(5)]
    assert sorted(os.listdir(viz_dir)) == [f"{i:06d}.png" for i in range(5)]

    n2, means2 = trainer.inference(state_single, _NoDropLoader(),
                                   n_batches=1)
    assert n2 == 2 and means2["n_samples"] == 2


class _ArrayDataset:
    """8 deterministic in-memory samples (no file I/O, no native path)."""

    def __init__(self, n=8):
        self.samples = [_batch(200 + i, b=1) for i in range(n)]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        images, flow = self.samples[i]
        return np.asarray(images)[0], np.asarray(flow)[0]


def test_multihost_data_pipeline(factory_single, state_single):
    """VERDICT r1 item 5: the multi-host input path, simulated in-process.

    Two process-striped DataLoaders (process_count=2) produce per-host local
    shards; placing those shards onto a 4-device data mesh exactly as
    ``jax.make_array_from_process_local_data`` would (each host's stripe on
    the devices it owns) must reconstruct the single-process global batch
    bit-for-bit, and one train step on the assembled batch must match the
    step on the plainly device_put batch."""
    from flownet2_tpu.data.loader import DataLoader, device_prefetch

    ds = _ArrayDataset(8)
    kw = dict(batch_size=8, shuffle=True, seed=5, num_workers=2)
    full = DataLoader(ds, **kw)
    h0 = DataLoader(ds, process_count=2, process_index=0, **kw)
    h1 = DataLoader(ds, process_count=2, process_index=1, **kw)
    fb = next(iter(full))
    b0, b1 = next(iter(h0)), next(iter(h1))
    assert b0.images.shape[0] == b1.images.shape[0] == 4

    mesh = make_mesh(jax.devices()[:4], spatial=1)
    plan = MeshPlan(mesh)
    owned = {d.id: host for host, devs in
             enumerate((mesh.devices.ravel()[:2], mesh.devices.ravel()[2:]))
             for d in devs}
    locals_ = {0: b0, 1: b1}

    def assemble(sharding, field, global_shape):
        shards = []
        devices = []
        for dev, idx in sharding.addressable_devices_indices_map(
                global_shape).items():
            bsl = idx[0]
            host = owned[dev.id]
            local = getattr(locals_[host], field)
            lo = bsl.start - host * 4
            shards.append(jax.device_put(local[lo:bsl.stop - host * 4],
                                         dev))
            devices.append(dev)
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, shards)

    g_images = assemble(plan.batch_images, "images", fb.images.shape)
    g_flow = assemble(plan.batch_flow, "flow", fb.flow.shape)
    # the assembled global batch equals the single-process batch
    np.testing.assert_array_equal(np.asarray(g_images), fb.images)
    np.testing.assert_array_equal(np.asarray(g_flow), fb.flow)

    # ... and the real transfer path (device_prefetch with sharding ->
    # jax.make_array_from_process_local_data; on one process local == global)
    pb = next(device_prefetch(iter(full), sharding=plan.batch))
    np.testing.assert_array_equal(np.asarray(pb.images), fb.images)
    assert pb.images.sharding.is_equivalent_to(g_images.sharding,
                                               ndim=pb.images.ndim)

    # one train step from each input path gives identical metrics
    factory = StepFactory(factory_single.model, MultiScale(),
                          factory_single.tx, plan=plan)
    state = jax.device_put(jax.tree.map(jnp.copy, state_single),
                           plan.replicated)
    step = factory.train_step()
    _, m_assembled = step(jax.tree.map(jnp.copy, state), g_images, g_flow)
    _, m_direct = step(state,
                       jax.device_put(jnp.asarray(fb.images),
                                      plan.batch_images),
                       jax.device_put(jnp.asarray(fb.flow), plan.batch_flow))
    assert float(m_assembled["loss"]) == pytest.approx(
        float(m_direct["loss"]), rel=1e-6)


def test_profile_hook(tmp_path, factory_single, state_single):
    """--profile N captures a jax.profiler trace into <save>/profile
    (VERDICT r1 item 10, SURVEY §5 tracing row)."""
    import glob
    import os
    from flownet2_tpu.data.loader import Batch
    from flownet2_tpu.train import Trainer, TrainerConfig

    class L:
        def __len__(self):
            return 3

        def __iter__(self):
            for i in range(3):
                images, flow = _batch(i, b=2)
                yield Batch(images, flow)

    cfg = TrainerConfig(total_epochs=1, save_dir=str(tmp_path),
                        profile_steps=1, validation_frequency=10**9)
    trainer = Trainer(factory_single, cfg)
    trainer.train_epoch(jax.tree.map(jnp.copy, state_single), L(), epoch=0)
    traces = glob.glob(os.path.join(str(tmp_path), "profile", "**", "*"),
                       recursive=True)
    assert any(os.path.isfile(t) for t in traces), traces


def test_checkpoint_roundtrip(tmp_path, factory_single, state_single):
    from flownet2_tpu.checkpoints import restore_checkpoint, save_checkpoint

    state = state_single
    save_checkpoint(tmp_path, jax.device_get(state), epoch=3, best_epe=1.5,
                    is_best=True)
    template = jax.tree.map(np.zeros_like, jax.device_get(state))
    restored, meta = restore_checkpoint(tmp_path, template)
    assert meta == {"epoch": 3, "best_EPE": 1.5}
    for a, b in zip(jax.tree.leaves(jax.device_get(state)),
                    jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (tmp_path / "model_best").exists()


def test_checkpoint_old_recovery(tmp_path, factory_single, state_single):
    """A crash inside _replace_dir's rename window leaves the checkpoint
    parked at <tag>.old and nothing at the canonical path;
    restore_checkpoint must recover it (ADVICE r3 / review fix)."""
    from flownet2_tpu.checkpoints import restore_checkpoint, save_checkpoint

    state = state_single
    save_checkpoint(tmp_path, jax.device_get(state), epoch=7, best_epe=2.5)
    # simulate the crash window: canonical dir renamed away to .old
    path = tmp_path / "train-checkpoint"
    path.rename(tmp_path / "train-checkpoint.old")
    template = jax.tree.map(np.zeros_like, jax.device_get(state))
    restored, meta = restore_checkpoint(tmp_path, template)
    assert meta == {"epoch": 7, "best_EPE": 2.5}
    for a, b in zip(jax.tree.leaves(jax.device_get(state)),
                    jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # recovery is permanent: the canonical path exists again
    assert path.exists() and not (tmp_path / "train-checkpoint.old").exists()


def test_trainer_integration(tmp_path, factory_single, state_single):
    """Two tiny epochs end-to-end with validation + resume."""
    from flownet2_tpu.data.loader import Batch
    from flownet2_tpu.train import Trainer, TrainerConfig

    class FakeLoader:
        def __init__(self, n=2, seed=0):
            self.n, self.seed = n, seed

        def set_epoch(self, e):
            self.seed = e

        def __len__(self):
            return self.n

        def __iter__(self):
            for i in range(self.n):
                images, flow = _batch(self.seed * 10 + i, b=2)
                yield Batch(images, flow)

    cfg = TrainerConfig(total_epochs=2, validation_frequency=1,
                        save_dir=str(tmp_path), log_frequency=1)
    trainer = Trainer(factory_single, cfg)
    state = trainer.fit(jax.tree.map(jnp.copy, state_single),
                        FakeLoader(), val_loader=FakeLoader(1, 99))
    assert int(np.asarray(state.step)) == 4  # 2 epochs x 2 steps
    # metrics file written
    assert (tmp_path / "run.metrics.jsonl").exists()
    # resume restores epoch + step
    trainer2 = Trainer(factory_single, cfg)
    restored = trainer2.resume(jax.device_get(state))
    assert trainer2.start_epoch == 2
    assert int(np.asarray(restored.step)) == 4


def test_bench_scaling_table_runs_multi_device():
    """BASELINE.md protocol step 4 harness: the data-parallel scaling
    table in bench.py must run at N>1 devices (here the CPU mesh) and
    report positive throughput + efficiency per row."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    rows = bench.scaling_table(model_name="FlowNet2S", per_device_batch=1,
                               h=64, w=64, device_counts=(1, 2), iters=3,
                               train_iters=3)
    assert [r["devices"] for r in rows] == [1, 2]
    for r in rows:
        assert r["fps"] > 0
        assert r["train_fps"] > 0
        # Efficiency is a wall-clock ratio: on a loaded CI machine the
        # 2-device CPU-mesh row can spuriously "super-scale" (the 1-device
        # timing absorbed the contention), so only sanity-bound it
        # (r3 flake: a 1.5 upper bound went red under pytest -n load).
        assert 0 < r["efficiency"] <= 8.0
        assert 0 < r["train_efficiency"] <= 8.0
    assert rows[0]["efficiency"] == 1.0
    assert rows[0]["train_efficiency"] == 1.0


def test_train_n_batches_and_start_epoch(tmp_path, factory_single,
                                         state_single):
    """--train_n_batches caps steps per epoch and --start_epoch overrides
    the resumed epoch (reference main.py:25,28; VERDICT r4 next #9)."""
    from flownet2_tpu.data.loader import Batch
    from flownet2_tpu.train import Trainer, TrainerConfig

    class L:
        def __len__(self):
            return 4

        def __iter__(self):
            for i in range(4):
                images, flow = _batch(i, b=2)
                yield Batch(images, flow)

    cfg = TrainerConfig(total_epochs=2, validation_frequency=10**9,
                        train_n_batches=1, save_dir=str(tmp_path))
    trainer = Trainer(factory_single, cfg)
    state = trainer.fit(jax.tree.map(jnp.copy, state_single), L())
    # 2 epochs x 1 (capped from 4) steps
    assert int(np.asarray(state.step)) == 2

    # start_epoch overrides both the fresh 0 and the checkpoint's epoch
    cfg2 = TrainerConfig(total_epochs=2, validation_frequency=10**9,
                         start_epoch=2, save_dir=str(tmp_path))
    t2 = Trainer(factory_single, cfg2)
    assert t2.start_epoch == 2
    st = t2.fit(jax.tree.map(jnp.copy, state_single), L())
    assert int(np.asarray(st.step)) == 0  # range(2, 2) -> no training
    restored = t2.resume(jax.device_get(state))  # ckpt says epoch 1|2
    assert t2.start_epoch == 2  # flag wins over checkpoint epoch
    del restored
