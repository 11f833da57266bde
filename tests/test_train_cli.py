"""Training-CLI coverage (reference: CompressAI/tests/test_train.py, which
runs examples/train.py on fakedata and diffs a seeded golden log).

These drive lmic_tpu.utils.train_cli.main() in-process on tiny synthetic
datasets: checkpoint/best-file writing, epoch resume, a seeded golden loss
trajectory (GENERATE_EXPECTED=1 regenerates, reference convention), and the
two-stage guided->master recipe. The conftest mesh has 8 virtual devices;
--devices restricts the mesh where a smaller batch keeps the test cheap.
"""

import json
import os
import re
from pathlib import Path

import numpy as np
import pytest

from lmic_tpu.utils import train_cli

EXPECTED = Path(__file__).parent / "expected"


def _write_images(d: Path, n: int, size, channels=3, seed=0):
    from PIL import Image

    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        arr = (rng.random((*size, channels)) * 255).astype(np.uint8)
        if channels == 1:
            img = Image.fromarray(arr[..., 0], mode="L")
        else:
            img = Image.fromarray(arr)
        img.save(d / f"img_{i:03d}.png")


def _losses(stdout: str):
    return [float(m) for m in re.findall(r"loss=([0-9.]+) mse", stdout)]


@pytest.fixture(scope="module")
def image_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    _write_images(root / "train", 24, (40, 40), seed=1)
    return str(root)


class TestTrainSingleCLI:
    def test_writes_checkpoints_and_logs(self, image_dataset, tmp_path,
                                         monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        save = tmp_path / "ck.ckpt"
        train_cli.main([
            "--arch", "bmshj2018-factorized", "-q", "1",
            "-d", image_dataset, "--epochs", "2", "--batch-size", "8",
            "--patch-size", "32", "32", "--log-every", "1",
            "--prefetch", "0", "--seed", "7", "--save-path", str(save),
        ])
        out = capsys.readouterr().out
        assert "epoch 0 it 0: loss=" in out
        assert "epoch 1 done" in out
        assert save.exists()
        assert (tmp_path / "ck_best_loss.ckpt").exists()
        assert all(np.isfinite(v) for v in _losses(out))
        assert not (tmp_path / "error.log").exists()

    def test_resume_continues_from_saved_epoch(self, image_dataset, tmp_path,
                                               monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        save = tmp_path / "ck.ckpt"
        args = [
            "--arch", "bmshj2018-factorized", "-q", "1",
            "-d", image_dataset, "--batch-size", "8",
            "--patch-size", "32", "32", "--log-every", "1",
            "--prefetch", "0", "--seed", "7", "--save-path", str(save),
        ]
        train_cli.main(args + ["--epochs", "1"])
        capsys.readouterr()
        train_cli.main(args + ["--epochs", "2", "--checkpoint", str(save)])
        out = capsys.readouterr().out
        assert "epoch 1 it 0" in out and "epoch 0 it" not in out

    def test_golden_loss_trajectory(self, image_dataset, tmp_path,
                                    monkeypatch, capsys):
        """Seeded first-epoch losses pinned to a golden file: catches silent
        numeric drift in the data/loss/step path (reference convention:
        tests/test_train.py:38-88 diffs a seeded train log;
        GENERATE_EXPECTED=1 regenerates)."""
        monkeypatch.chdir(tmp_path)
        train_cli.main([
            "--arch", "bmshj2018-factorized", "-q", "1",
            "-d", image_dataset, "--epochs", "1", "--batch-size", "8",
            "--patch-size", "32", "32", "--log-every", "1",
            "--prefetch", "0", "--seed", "7",
            "--save-path", str(tmp_path / "g.ckpt"),
        ])
        losses = _losses(capsys.readouterr().out)
        assert len(losses) == 3  # 24 images / batch 8
        golden = EXPECTED / "train_log_cli_seed7.json"
        if os.environ.get("GENERATE_EXPECTED"):
            golden.write_text(json.dumps({"loss": losses}, indent=2) + "\n")
        want = json.loads(golden.read_text())["loss"]
        np.testing.assert_allclose(losses, want, rtol=1e-4)


@pytest.mark.slow
class TestTrainMasterCLI:
    def test_two_stage_master_recipe(self, tmp_path, monkeypatch, capsys):
        """guided checkpoint -> master training consuming its frozen
        reconstruction + hidden taps (reference train.py:208-274). FLIR
        pairing for channel=3: RGB dir is the master at 2x resolution,
        thermal_8_bit the 1-channel guide; the guide trains first via the
        single-model path."""
        monkeypatch.chdir(tmp_path)
        ds = tmp_path / "flir"
        # RGB master at 2x the thermal guide (FLIR layout); guided factor
        # is 64 (first_stride 2), so guide crops are 64x64
        _write_images(ds / "RGB", 2, (128, 128), channels=3, seed=2)
        _write_images(ds / "thermal_8_bit", 2, (64, 64), channels=1, seed=3)
        # the guide trains from a root/train layout (ImageFolderT)
        _write_images(ds / "guide_train" / "train", 2, (72, 72),
                      channels=1, seed=4)

        g_save = tmp_path / "guided.ckpt"
        train_cli.main([
            "--arch", "guided", "-q", "1", "--channel", "1",
            "-d", str(ds / "guide_train"), "--epochs", "1",
            "--batch-size", "2", "--devices", "2",
            "--patch-size", "64", "64", "--log-every", "1",
            "--prefetch", "0", "--seed", "7", "--save-path", str(g_save),
        ])
        capsys.readouterr()
        assert g_save.exists()

        m_save = tmp_path / "master.ckpt"
        train_cli.main([
            "--arch", "master", "-q", "1", "--channel", "3",
            "-d", str(ds / "RGB"), "--epochs", "1", "--batch-size", "2",
            "--devices", "2", "--crop-size", "64", "64",
            "--log-every", "1", "--steps-per-epoch", "1",
            "--prefetch", "0", "--seed", "7",
            "--guided-checkpoint", str(g_save),
            "--save-path", str(m_save),
        ])
        out = capsys.readouterr().out
        assert "epoch 0 it 0: loss=" in out
        assert m_save.exists()
        assert all(np.isfinite(v) for v in _losses(out))
