"""Golden RD fixtures: lmic-eval output pinned end-to-end.

The reference regression-pins its eval CLI with golden JSONs
(tests/expected/eval_*.json, regenerable via GENERATE_EXPECTED=1 —
test_eval_model.py:42,107-111). Same discipline here on a deterministic
synthetic image set: model weights come from the fixed create_model
default key, images from a seeded rng, so psnr/ms-ssim/bpp are exactly
reproducible; timing keys are excluded. Regenerate deliberately with
GENERATE_EXPECTED=1 after intentional numeric changes.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

EXPECTED_DIR = Path(__file__).parent / "expected"
NON_DETERMINISTIC = {"encoding_time", "decoding_time"}


def _write_images(d: Path, names, size=(128, 128), mode="RGB"):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)
    for name in names:
        H, W = size
        base = rng.random((8, 8, 3 if mode == "RGB" else 1))
        arr = np.kron(base, np.ones((H // 8, W // 8, 1)))
        yy, xx = np.mgrid[0:H, 0:W]
        grad = (0.25 * (xx / W) + 0.25 * (yy / H))[..., None]
        arr = np.clip(0.6 * arr + grad, 0, 1)
        img = (arr * 255).astype(np.uint8)
        if mode == "L":
            img = img[..., 0]
        Image.fromarray(img, mode=mode).save(d / name)


def _check_golden(results, golden_name):
    comparable = {
        k: v for k, v in results.items() if k not in NON_DETERMINISTIC
    }
    path = EXPECTED_DIR / golden_name
    if os.environ.get("GENERATE_EXPECTED"):
        EXPECTED_DIR.mkdir(exist_ok=True)
        with open(path, "w") as f:
            json.dump(comparable, f, indent=2, sort_keys=True)
        print(f"regenerated {path}")
        return
    if not path.exists():
        pytest.fail(
            f"golden file missing: {path} (run with GENERATE_EXPECTED=1)"
        )
    with open(path) as f:
        want = json.load(f)
    assert set(comparable) == set(want), (
        sorted(comparable), sorted(want)
    )
    for k in want:
        np.testing.assert_allclose(
            comparable[k], want[k], rtol=1e-4,
            err_msg=f"{golden_name}: {k}",
        )


def _run_eval(tmp_path, argv):
    from lmic_tpu.utils.eval_model import main

    out = tmp_path / "results.json"
    main(argv + ["--output", str(out)])
    with open(out) as f:
        return json.load(f)[-1]["results"]


def test_eval_entropy_estimation_golden(tmp_path):
    d = tmp_path / "images"
    _write_images(d, ["a.png", "b.png"])
    results = _run_eval(tmp_path, [
        "--arch", "bmshj2018-factorized", "-q", "1", "-d", str(d),
        "--entropy-estimation",
    ])
    _check_golden(results, "eval_ee_bmshj2018-factorized_1.json")


def test_eval_codec_golden(tmp_path):
    """Real-coder mode: pins the whole chain image -> pad -> compress ->
    rANS -> decompress -> metrics, including actual bitstream sizes."""
    d = tmp_path / "images"
    _write_images(d, ["a.png", "b.png"])
    results = _run_eval(tmp_path, [
        "--arch", "bmshj2018-hyperprior", "-q", "1", "-d", str(d),
    ])
    _check_golden(results, "eval_rans_bmshj2018-hyperprior_1.json")


@pytest.mark.slow
def test_eval_rgbt_golden(tmp_path):
    """Paired guided+master eval: pins the beta/gamma side-info bpp
    accounting (64*2*4*8 bits, reference __main__rgbt.py:142) along with
    the paired metrics."""
    master_dir = tmp_path / "val" / "thermal_8_bit"
    guide_dir = tmp_path / "val" / "RGB"
    _write_images(master_dir, ["FLIR_08865.png"], size=(512, 640), mode="L")
    _write_images(guide_dir, ["FLIR_08865.png"], size=(512, 640))
    results = _run_eval(tmp_path, [
        "--arch", "master", "-q", "1", "--channel", "1",
        "-d", str(master_dir), "--rgbt", "--entropy-estimation",
        "--crop-size", "64", "64",
    ])
    _check_golden(results, "eval_rgbt_master_1.json")
