"""Dataset & transform tests over generated fake data (the reference's
fakedata asset pattern)."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from lmic_tpu.datasets import (
    DataLoader,
    ImageFolder,
    ImageFolderRGB,
    RawVideoSequence,
    VideoFolder,
    VideoFormat,
    get_raw_video_file_info,
)
from lmic_tpu.transforms import (
    rgb2ycbcr,
    ycbcr2rgb,
    yuv_420_to_444,
    yuv_444_to_420,
)


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("images")
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        d = root / split
        d.mkdir()
        for i in range(4):
            arr = (rng.random((300, 400, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img{i:03d}.png")
    return root


@pytest.fixture(scope="module")
def rgbt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("flir")
    rgb = root / "RGB"
    th = root / "thermal_8_bit"
    rgb.mkdir(), th.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray(
            (rng.random((1024, 1280, 3)) * 255).astype(np.uint8)
        ).save(rgb / f"FLIR_{i:05d}.jpg")
        Image.fromarray(
            (rng.random((512, 640)) * 255).astype(np.uint8)
        ).save(th / f"FLIR_{i:05d}.jpeg")
    return root


class TestImageFolder:
    def test_train_crop(self, image_root):
        ds = ImageFolder(image_root, "train", patch_size=(128, 128), seed=0)
        assert len(ds) == 4
        x = ds[0]
        assert x.shape == (128, 128, 3) and x.dtype == np.float32
        assert 0 <= x.min() and x.max() <= 1

    def test_loader_batches(self, image_root):
        ds = ImageFolder(image_root, "train", patch_size=(64, 64), seed=0)
        dl = DataLoader(ds, batch_size=2, prefetch=2)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0].shape == (2, 64, 64, 3)

    def test_loader_no_prefetch_same_count(self, image_root):
        ds = ImageFolder(image_root, "train", patch_size=(64, 64), seed=0)
        assert len(list(DataLoader(ds, 2, prefetch=0))) == 2


class TestImageFolderRGB:
    def test_paired_ratio(self, rgbt_root):
        ds = ImageFolderRGB(str(rgbt_root / "RGB"), crop_size=(256, 320),
                            channel=3, seed=0)
        assert len(ds) == 3
        x, guided = ds[0]
        assert guided.shape == (256, 320, 1)
        assert x.shape == (512, 640, 3)  # master is exactly 2x guide


class TestVideoFolder:
    def test_clip_loading(self, tmp_path):
        seq = tmp_path / "sequences" / "00001" / "0266"
        seq.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(1, 8):
            Image.fromarray(
                (rng.random((256, 448, 3)) * 255).astype(np.uint8)
            ).save(seq / f"im{i}.png")
        (tmp_path / "sep_trainlist.txt").write_text("00001/0266\n")
        ds = VideoFolder(tmp_path, num_frames=3, patch_size=(128, 128),
                         seed=0)
        clip = ds[0]
        assert clip.shape == (3, 128, 128, 3)


class TestRawVideo:
    def test_filename_parsing(self):
        info = get_raw_video_file_info(
            "RaceHorses_832x480_30fps_yuv420_8bit.yuv"
        )
        assert info["width"] == 832 and info["height"] == 480
        assert info["format"] == VideoFormat.YUV420
        assert info["bitdepth"] == 8

    def test_mmap_roundtrip(self, tmp_path):
        W, H, T = 64, 32, 2
        rng = np.random.default_rng(0)
        frames = rng.integers(
            0, 255, T * (H * W + 2 * (H // 2) * (W // 2)), dtype=np.uint8
        )
        path = tmp_path / f"test_{W}x{H}_25_yuv420.yuv"
        frames.tofile(path)
        seq = RawVideoSequence.from_file(str(path))
        assert len(seq) == T
        frame = seq[0]
        assert frame["y"].shape == (H, W)
        assert frame["u"].shape == (H // 2, W // 2)


class TestColorTransforms:
    def test_ycbcr_roundtrip(self):
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.random((2, 8, 8, 3), dtype=np.float32))
        back = ycbcr2rgb(rgb2ycbcr(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb),
                                   atol=1e-5)

    def test_matches_torch_reference(self):
        # compare against the reference formula computed via torch
        torch = pytest.importorskip("torch")
        import sys
        rng = np.random.default_rng(1)
        rgb = rng.random((1, 3, 8, 8)).astype(np.float32)
        Kr, Kg, Kb = 0.2126, 0.7152, 0.0722
        r, g, b = rgb[:, 0], rgb[:, 1], rgb[:, 2]
        y = Kr * r + Kg * g + Kb * b
        cb = 0.5 * (b - y) / (1 - Kb) + 0.5
        cr = 0.5 * (r - y) / (1 - Kr) + 0.5
        ours = np.asarray(
            rgb2ycbcr(jnp.asarray(rgb.transpose(0, 2, 3, 1)))
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, np.stack([y, cb, cr], 1), atol=1e-6)

    def test_420_roundtrip_shapes(self):
        rng = np.random.default_rng(2)
        yuv = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
        y, u, v = yuv_444_to_420(yuv)
        assert y.shape == (1, 16, 16, 1)
        assert u.shape == (1, 8, 8, 1)
        out = yuv_420_to_444((y, u, v))
        assert out.shape == (1, 16, 16, 3)


class TestTransformWrappers:
    def test_roundtrip_classes(self):
        import jax.numpy as jnp

        from lmic_tpu.transforms import (
            RGB2YCbCr,
            YCbCr2RGB,
            YUV420To444,
            YUV444To420,
        )

        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        ycc = RGB2YCbCr()(rgb)
        back = YCbCr2RGB()(ycc)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb),
                                   atol=1e-4)
        planes = YUV444To420()(ycc)
        assert planes[1].shape == (1, 8, 8, 1)
        up = YUV420To444()(planes)
        assert up.shape == (1, 16, 16, 3)
        assert "RGB2YCbCr" in repr(RGB2YCbCr())


class TestImageFolderTestPairing:
    @pytest.fixture()
    def flir_root(self, tmp_path):
        from PIL import Image

        (tmp_path / "thermal_8_bit").mkdir()
        (tmp_path / "RGB").mkdir()
        rng = np.random.default_rng(0)
        for i in range(2):
            t = (rng.random((512, 640)) * 255).astype(np.uint8)
            Image.fromarray(t, "L").save(
                tmp_path / "thermal_8_bit" / f"FLIR_0000{i}.jpeg"
            )
            c = (rng.random((1024, 1280, 3)) * 255).astype(np.uint8)
            Image.fromarray(c).save(tmp_path / "RGB" / f"FLIR_0000{i}.jpg")
        return tmp_path

    def test_channel1_master_is_small_thermal(self, flir_root):
        from lmic_tpu.datasets.image import ImageFolderTest

        ds = ImageFolderTest(
            str(flir_root / "thermal_8_bit"), crop_size=(128, 160),
            channel=1, test_ids=[""],
        )
        assert len(ds) == 2
        x, guided = ds[0]
        assert x.shape == (128, 160, 1)        # thermal master at 1x
        assert guided.shape == (256, 320, 3)   # RGB guide at 2x

    def test_channel3_master_is_big_rgb(self, flir_root):
        from lmic_tpu.datasets.image import ImageFolderTest

        ds = ImageFolderTest(
            str(flir_root / "RGB"), crop_size=(128, 160),
            channel=3, test_ids=[""],
        )
        x, guided = ds[0]
        assert x.shape == (256, 320, 3)        # RGB master at 2x
        assert guided.shape == (128, 160, 1)   # thermal guide at 1x


class TestImageFolderRGBChannel1:
    def test_thermal_master_full_frames_flip_only(self, tmp_path):
        from PIL import Image

        from lmic_tpu.datasets.image import ImageFolderRGB

        (tmp_path / "thermal_8_bit").mkdir()
        (tmp_path / "RGB").mkdir()
        rng = np.random.default_rng(0)
        t = (rng.random((512, 640)) * 255).astype(np.uint8)
        Image.fromarray(t, "L").save(
            tmp_path / "thermal_8_bit" / "FLIR_1.jpeg"
        )
        c = (rng.random((700, 900, 3)) * 255).astype(np.uint8)
        Image.fromarray(c).save(tmp_path / "RGB" / "FLIR_1.jpg")

        ds = ImageFolderRGB(
            str(tmp_path / "thermal_8_bit"), channel=1, seed=0
        )
        x, guided = ds[0]
        # reference semantics: full thermal master, RGB guide resized to
        # (1280, 1024); no scale/crop for channel=1
        assert x.shape == (512, 640, 1)
        assert guided.shape == (1024, 1280, 3)
