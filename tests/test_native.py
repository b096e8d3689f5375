"""Native (C++) data-path: decode parity with the Python readers.

The native library is optional (built on demand with g++ + libpng/libjpeg);
if it can't be built in this environment, these tests skip and the data
layer transparently uses the Python implementations instead.
"""

import os

import numpy as np
import pytest

from flownet2_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native fileio library not buildable")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


class TestFlo:
    def test_roundtrip(self, tmp_path, rng):
        flow = rng.randn(37, 53, 2).astype(np.float32)
        p = tmp_path / "a.flo"
        native.write_flo(p, flow)
        np.testing.assert_array_equal(native.read_flo(p), flow)

    def test_wire_format(self, tmp_path, rng):
        """Native writer produces the exact Middlebury wire format
        (magic 202021.25, W then H int32, row-major float32 pairs —
        reference utils/flow_utils.py:28-57)."""
        flow = rng.randn(11, 13, 2).astype(np.float32)
        p = tmp_path / "b.flo"
        native.write_flo(p, flow)
        with open(p, "rb") as f:
            magic = np.frombuffer(f.read(4), np.float32)[0]
            w = int(np.frombuffer(f.read(4), np.int32)[0])
            h = int(np.frombuffer(f.read(4), np.int32)[0])
            data = np.frombuffer(f.read(h * w * 8), np.float32)
        assert magic == np.float32(202021.25) and (h, w) == (11, 13)
        np.testing.assert_array_equal(data.reshape(11, 13, 2), flow)

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.flo"
        p.write_bytes(b"\x00" * 32)
        with pytest.raises(ValueError, match="magic"):
            native.read_flo(p)


class TestImages:
    @pytest.mark.parametrize("ext", ["ppm", "png", "jpg"])
    def test_matches_pil(self, tmp_path, rng, ext):
        from PIL import Image
        img = (rng.rand(24, 31, 3) * 255).astype(np.uint8)
        p = tmp_path / f"im.{ext}"
        Image.fromarray(img).save(p)
        got = native.read_image(p)
        want = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(got, want)

    def test_grayscale_replicated(self, tmp_path, rng):
        from PIL import Image
        img = (rng.rand(16, 20) * 255).astype(np.uint8)
        p = tmp_path / "gray.png"
        Image.fromarray(img).save(p)
        got = native.read_image(p)
        assert got.shape == (16, 20, 3)
        np.testing.assert_array_equal(got[..., 0], img)
        np.testing.assert_array_equal(got[..., 1], img)


class TestBatchLoad:
    def test_crops_and_flip(self, tmp_path, rng):
        from PIL import Image
        H, W, CH, CW, N = 40, 60, 32, 48, 5
        ipaths, fpaths, imgs_ref, flows_ref = [], [], [], []
        for i in range(N):
            img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            p = tmp_path / f"i{i}.png"
            Image.fromarray(img).save(p)
            ipaths.append(str(p))
            imgs_ref.append(img)
            fl = rng.randn(H, W, 2).astype(np.float32)
            q = tmp_path / f"f{i}.flo"
            native.write_flo(q, fl)
            fpaths.append(str(q))
            flows_ref.append(fl)
        ioff = rng.randint(0, 8, size=(N, 2))
        foff = rng.randint(0, 8, size=(N, 2))
        imgs, flows = native.batch_load(ipaths, ioff, fpaths, foff, CH, CW)
        for i in range(N):
            oy, ox = ioff[i]
            np.testing.assert_array_equal(
                imgs[i], imgs_ref[i][oy:oy + CH, ox:ox + CW].astype(np.float32))
            oy, ox = foff[i]
            np.testing.assert_array_equal(
                flows[i], flows_ref[i][oy:oy + CH, ox:ox + CW])
        # ChairsSDHom row flip (reference datasets.py:289): crop offsets are
        # in post-flip coordinates
        _, flipped = native.batch_load([], np.zeros((0, 2)), fpaths, foff,
                                       CH, CW, flip_flow_vertical=True)
        for i in range(N):
            oy, ox = foff[i]
            np.testing.assert_array_equal(
                flipped[i], flows_ref[i][::-1][oy:oy + CH, ox:ox + CW])

    def test_missing_file_errors(self, tmp_path):
        with pytest.raises(IOError):
            native.batch_load([str(tmp_path / "nope.png")],
                              np.zeros((1, 2)), [], np.zeros((0, 2)), 8, 8)
