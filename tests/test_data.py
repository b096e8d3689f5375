"""Data pipeline tests: .flo round-trip, dataset indexing behaviors,
crops, loader batching (SURVEY.md §4.5)."""

import os

import numpy as np
import pytest

from flownet2_tpu.data import (
    Batch,
    ChairsSDHomTrain,
    DataLoader,
    FlyingChairs,
    ImagesFromFolder,
    MpiSintelClean,
    StaticCenterCrop,
    StaticRandomCrop,
    flow_to_image,
    get_dataset,
    read_flo,
    read_gen,
    write_flo,
)


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


def _rand_img(rng, h=128, w=192):
    return rng.randint(0, 255, (h, w, 3), dtype=np.uint8)


@pytest.fixture
def sintel_tree(tmp_path):
    """Minimal MPI-Sintel layout: flow/<scene>/frame_%04d.flo + clean pngs."""
    rng = np.random.RandomState(0)
    scene = "alley_1"
    (tmp_path / "flow" / scene).mkdir(parents=True)
    (tmp_path / "clean" / scene).mkdir(parents=True)
    for i in (1, 2, 3):
        _write_png(tmp_path / "clean" / scene / f"frame_{i:04d}.png",
                   _rand_img(rng))
    for i in (1, 2):
        write_flo(tmp_path / "flow" / scene / f"frame_{i:04d}.flo",
                  rng.randn(128, 192, 2).astype(np.float32))
    # a 'test' scene that must be skipped (datasets.py:47-49)
    (tmp_path / "flow" / "test_scene").mkdir(parents=True)
    write_flo(tmp_path / "flow" / "test_scene" / "frame_0001.flo",
              np.zeros((128, 192, 2), np.float32))
    return tmp_path


def test_flo_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    flow = rng.randn(37, 53, 2).astype(np.float32)
    p = tmp_path / "x.flo"
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)
    # magic check (flow_utils.py:5)
    with open(p, "rb") as f:
        assert np.frombuffer(f.read(4), np.float32)[0] == np.float32(202021.25)


def test_flo_bad_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        read_flo(p)


def test_sintel_index_and_sample(sintel_tree):
    ds = MpiSintelClean(root=str(sintel_tree))
    assert ds.size == 2  # test scene skipped, frame 3 has no flow
    assert ds.render_size == [128, 192]
    images, flow = ds[0]
    assert images.shape == (2, 128, 192, 3)
    assert flow.shape == (128, 192, 2)
    assert images.dtype == flow.dtype == np.float32


def test_sintel_center_crop_render_size(sintel_tree):
    # frames 128x192 are multiples of 64 -> render = full size; with a
    # non-/64 frame the dataset snaps down (datasets.py:68-72)
    ds = MpiSintelClean(root=str(sintel_tree), inference_size=(64, 128))
    images, flow = ds[0]
    assert images.shape == (2, 64, 128, 3)


def test_random_crop_consistency(sintel_tree):
    ds = MpiSintelClean(root=str(sintel_tree), is_cropped=True,
                        crop_size=(64, 64), seed=3)
    images, flow = ds[1]
    assert images.shape == (2, 64, 64, 3)
    assert flow.shape == (64, 64, 2)


def test_crops():
    rng = np.random.RandomState(2)
    img = rng.rand(10, 12, 3)
    c = StaticCenterCrop((10, 12), (4, 6))
    np.testing.assert_array_equal(c(img), img[3:7, 3:9])
    rc = StaticRandomCrop((10, 12), (4, 6), (3, 2))
    out1, out2 = rc(img), rc(img)
    np.testing.assert_array_equal(out1, img[3:7, 2:8])
    np.testing.assert_array_equal(out1, out2)  # offset fixed


def test_deterministic_crops(chairs_tree):
    """Crops are a pure function of (seed, epoch, index): batch_plan and
    __getitem__ agree, replicate passes differ, epochs differ, and a
    re-created dataset reproduces them (VERDICT r1 weak #6)."""
    def build():
        ds = FlyingChairs(root=str(chairs_tree), is_cropped=True,
                          crop_size=(32, 32), seed=7, replicates=2)
        return ds

    ds = build()
    o_a = ds._crop_origin(1, (64, 64), (32, 32))
    # same epoch/index -> same origin (and a fresh dataset agrees)
    assert build()._crop_origin(1, (64, 64), (32, 32)) == o_a
    # replicate pass (index + size) draws a different crop
    assert ds._crop_origin(1 + ds.size, (64, 64), (32, 32)) != o_a
    # epochs advance the stream
    ds.set_epoch(1)
    assert ds._crop_origin(1, (64, 64), (32, 32)) != o_a
    ds.set_epoch(0)

    # batch_plan and __getitem__ produce identical pixels
    plan = ds.batch_plan([1])
    oy, ox = map(int, plan["img_offsets"][0])
    assert (oy, ox) == o_a
    images, flow = ds[1]
    full_img, _ = FlyingChairs(root=str(chairs_tree))[1]
    np.testing.assert_array_equal(images[0], full_img[0][oy:oy+32, ox:ox+32])


@pytest.fixture
def chairs_tree(tmp_path):
    rng = np.random.RandomState(3)
    for i in range(3):
        from PIL import Image
        for j in (1, 2):
            Image.fromarray(_rand_img(rng, 64, 64)).save(
                tmp_path / f"{i:05d}_img{j}.ppm")
        write_flo(tmp_path / f"{i:05d}_flow.flo",
                  rng.randn(64, 64, 2).astype(np.float32))
    return tmp_path


def test_flying_chairs(chairs_tree):
    ds = FlyingChairs(root=str(chairs_tree))
    assert ds.size == 3
    images, flow = ds[2]
    assert images.shape == (2, 64, 64, 3)


def test_chairs_sdhom_vertical_flip(tmp_path):
    rng = np.random.RandomState(4)
    for sub in ("t0", "t1", "flow"):
        (tmp_path / "train" / sub).mkdir(parents=True)
    _write_png(tmp_path / "train" / "t0" / "a.png", _rand_img(rng, 64, 64))
    _write_png(tmp_path / "train" / "t1" / "a.png", _rand_img(rng, 64, 64))
    flow = rng.randn(64, 64, 2).astype(np.float32)
    write_flo(tmp_path / "train" / "flow" / "a.flo", flow)
    ds = ChairsSDHomTrain(root=str(tmp_path))
    _, got = ds[0]
    np.testing.assert_array_equal(got, flow[::-1])  # datasets.py:289


def test_images_from_folder(tmp_path):
    rng = np.random.RandomState(5)
    for i in range(4):
        _write_png(tmp_path / f"f{i}.png", _rand_img(rng, 64, 64))
    ds = ImagesFromFolder(root=str(tmp_path))
    assert ds.size == 3  # consecutive pairs
    images, flow = ds[0]
    assert (flow == 0).all()  # zero targets (datasets.py:364)


def test_loader_batching(sintel_tree):
    ds = MpiSintelClean(root=str(sintel_tree), replicates=4)  # 8 samples
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=1)
    batches = list(dl)
    assert len(batches) == len(dl) == 2
    for b in batches:
        assert isinstance(b, Batch)
        assert b.images.shape == (4, 2, 128, 192, 3)
        assert b.flow.shape == (4, 128, 192, 2)
    dl.set_epoch(1)
    batches2 = list(dl)
    assert not np.array_equal(batches[0].images, batches2[0].images)


def test_loader_host_sharding(sintel_tree):
    ds = MpiSintelClean(root=str(sintel_tree), replicates=4)
    full = DataLoader(ds, batch_size=4, shuffle=False)
    h0 = DataLoader(ds, batch_size=4, shuffle=False, process_count=2,
                    process_index=0)
    h1 = DataLoader(ds, batch_size=4, shuffle=False, process_count=2,
                    process_index=1)
    fb = next(iter(full))
    b0, b1 = next(iter(h0)), next(iter(h1))
    np.testing.assert_array_equal(
        np.concatenate([b0.images, b1.images]), fb.images)


def test_registry():
    with pytest.raises(KeyError, match="unknown dataset"):
        get_dataset("Nope", root="/tmp")


def test_flow_to_image():
    rng = np.random.RandomState(6)
    img = flow_to_image(rng.randn(32, 32, 2).astype(np.float32) * 5)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert img.std() > 0


def test_read_gen_png_rgba(tmp_path):
    from PIL import Image
    rgba = np.random.RandomState(7).randint(0, 255, (8, 8, 4), dtype=np.uint8)
    Image.fromarray(rgba, "RGBA").save(tmp_path / "x.png")
    out = read_gen(tmp_path / "x.png")
    assert out.shape == (8, 8, 3)  # alpha dropped (frame_utils.py:10-13)


def test_loader_native_matches_python(sintel_tree):
    """The native whole-batch decode path must produce byte-identical
    batches to per-sample __getitem__ decoding (center crop + flow)."""
    from flownet2_tpu import native
    if not native.available():
        pytest.skip("native fileio not buildable")
    ds_py = MpiSintelClean(root=str(sintel_tree), replicates=2)
    ds_nat = MpiSintelClean(root=str(sintel_tree), replicates=2)
    py = DataLoader(ds_py, batch_size=4, shuffle=True, seed=3,
                    use_native=False)
    nat = DataLoader(ds_nat, batch_size=4, shuffle=True, seed=3)
    assert nat.use_native and not py.use_native
    for bp, bn in zip(py, nat):
        np.testing.assert_array_equal(bp.images, bn.images)
        np.testing.assert_array_equal(bp.flow, bn.flow)


def test_loader_native_random_crop(sintel_tree):
    """Random-crop offsets are drawn from the dataset RNG in the same order
    on both paths, so crops agree sample-for-sample."""
    from flownet2_tpu import native
    if not native.available():
        pytest.skip("native fileio not buildable")
    kw = dict(root=str(sintel_tree), replicates=2, is_cropped=True,
              crop_size=(64, 128), seed=7)
    # one worker: the per-sample path draws crop offsets sequentially
    py = DataLoader(MpiSintelClean(**kw), batch_size=4, shuffle=False,
                    use_native=False, num_workers=1)
    nat = DataLoader(MpiSintelClean(**kw), batch_size=4, shuffle=False)
    for bp, bn in zip(py, nat):
        assert bn.images.shape == (4, 2, 64, 128, 3)
        np.testing.assert_array_equal(bp.images, bn.images)
        np.testing.assert_array_equal(bp.flow, bn.flow)
