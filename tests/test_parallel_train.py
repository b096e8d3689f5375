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
    metrics = factory_single.eval_step()(state_single, images, flow)
    assert set(metrics) == {"loss", "epe", "epe_fullres"}
    assert np.isfinite(float(metrics["epe_fullres"]))


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
