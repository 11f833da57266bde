"""Reference-container file compatibility (codec_rgbt.py:141-249,355-450).

For the byte-interop family (non-AR image codecs + ssf2020), a file
written with the reference codec app's own header/body writer functions
around the reference model's compress() must be BYTE-IDENTICAL to what
`lmic-codec --container reference` writes for the same input — and each
side must decode the other's file.

The reference app module (examples/codec_rgbt.py) is loaded through the
oracle (our native kernels substituted for its pybind extensions), so its
write_uchars/write_uints/write_body/get_header run verbatim.
"""

import importlib.util
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tests.reference_oracle import reference_available  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not importable"
)

REF_CODEC_APP = "/root/reference/CompressAI/examples/codec_rgbt.py"


def _load_codec_app():
    """Import examples/codec_rgbt.py from the reference tree."""
    from tests.reference_oracle import load_reference

    load_reference()
    if not os.path.exists(REF_CODEC_APP):
        pytest.skip("reference codec app not present")
    spec = importlib.util.spec_from_file_location(
        "ref_codec_rgbt", REF_CODEC_APP
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_model(arch):
    from compressai.models.google import (
        FactorizedPrior,
        JointAutoregressiveHierarchicalPriors,
        MeanScaleHyperprior,
        ScaleHyperprior,
    )
    from compressai.models.waseda import Cheng2020Anchor

    return {
        "bmshj2018-factorized": lambda: FactorizedPrior(64, 96),
        "bmshj2018-hyperprior": lambda: ScaleHyperprior(64, 96),
        "mbt2018-mean": lambda: MeanScaleHyperprior(64, 96),
        "mbt2018": lambda: JointAutoregressiveHierarchicalPriors(64, 96),
        "cheng2020-anchor": lambda: Cheng2020Anchor(64),
    }[arch]()


def _imported_codec(arch, ref, size=(64, 64)):
    from lmic_tpu import zoo
    from lmic_tpu.zoo.pretrained import (
        import_reference_coding_state,
        import_reference_state_dict,
    )

    widths = {"N": 64} if arch.startswith("cheng2020") else {
        "N": 64, "M": 96
    }
    codec = zoo.create_model(
        arch, 1, key=jax.random.key(0), input_size=size, **widths
    )
    codec = type(codec)(
        codec.module,
        import_reference_state_dict(arch, ref.state_dict(), codec.variables),
    )
    assert import_reference_coding_state(ref.state_dict(), codec)
    return codec


# the AR archs exercise the raster-order compat scans
# (JointARCodec.compress_raster/decompress_raster): the per-pixel torch
# loops are the slow leg, so one anchor per AR machinery variant
@pytest.mark.parametrize(
    "arch",
    [
        "bmshj2018-factorized",
        "bmshj2018-hyperprior",
        "mbt2018-mean",
        "mbt2018",
        "cheng2020-anchor",
    ],
)
def test_image_file_byte_identical_and_cross_decodable(arch, tmp_path):
    import torch
    from PIL import Image

    cr = _load_codec_app()
    torch.manual_seed(0)
    ref = _ref_model(arch)
    ref.eval()
    ref.update(force=True)

    rng = np.random.default_rng(7)
    img_u8 = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    img_path = tmp_path / "in.png"
    Image.fromarray(img_u8).save(img_path)
    x_t = torch.from_numpy(
        img_u8.astype(np.float32) / 255.0
    ).permute(2, 0, 1)[None]

    # file written with the reference app's own functions around the
    # reference model's compress (encode_image minus PIL plumbing,
    # codec_rgbt.py:355-386)
    with torch.no_grad():
        out = ref.compress(x_t)
    header = cr.get_header(arch, "mse", 1, -1, cr.CodecType.IMAGE_CODEC)
    ref_file = tmp_path / "ref.bin"
    with open(ref_file, "wb") as f:
        cr.write_uchars(f, header)
        cr.write_uints(f, (64, 64))
        cr.write_uchars(f, (8,))
        cr.write_body(f, out["shape"], out["strings"])

    # lmic-codec writes the byte-identical file
    from lmic_tpu.utils import codec_cli

    codec = _imported_codec(arch, ref)
    our_file = tmp_path / "ours.bin"
    codec_cli.encode_image_ref(img_path, our_file, codec, arch, 1)
    assert our_file.read_bytes() == ref_file.read_bytes()

    # lmic-codec decodes the reference-encoded file
    out_png = tmp_path / "rec.png"
    with open(ref_file, "rb") as f:
        model_id, code = codec_cli.read_uchars(f, 2)
        assert codec_cli.REF_ID_TO_MODEL[model_id] == arch
        assert (code & 0x0F) + 1 == 1
        codec_cli.decode_image_ref(
            f, out_png, lambda a, q: codec, arch, 1
        )
    got = np.asarray(Image.open(out_png))
    with torch.no_grad():
        ref_dec = ref.decompress(out["strings"], out["shape"])
    want = np.clip(
        ref_dec["x_hat"][0].permute(1, 2, 0).numpy() * 255.0 + 0.5, 0, 255
    ).astype(np.uint8)
    # frameworks differ in the last float ulp; after 8-bit quantization
    # only knife-edge pixels may differ by one level
    assert np.abs(
        got.astype(np.int32) - want.astype(np.int32)
    ).max() <= 1

    # and the reference app reads OUR file back
    with open(our_file, "rb") as f:
        model, metric, quality = cr.parse_header(cr.read_uchars(f, 2))
        assert (model, metric, quality) == (arch, "mse", 1)
        cr.read_uints(f, 2)
        cr.read_uchars(f, 1)
        strings, shape = cr.read_body(f)
    with torch.no_grad():
        rt = ref.decompress(strings, list(shape))
    np.testing.assert_allclose(
        rt["x_hat"].numpy(), ref_dec["x_hat"].numpy(), atol=1e-6
    )


@pytest.mark.slow
def test_master_file_byte_identical_and_cross_decodable(tmp_path):
    """RGBT master reference container (codec_rgbt.py:328-386,511-554):
    our `--container reference` file — bare header, (h, w), bitdepth,
    64+64 beta/gamma floats, raster-order master AR streams — against a
    file produced by the reference app's own writer around the reference
    Guided/Master models' flow. The CODED BODY (all rANS streams) is
    byte-identical; the transmitted beta/gamma floats carry torch-vs-JAX
    last-ulp differences (~1e-8, pooled conv chains) and are asserted as
    floats — they are side info each decoder reads from the FILE, so
    interop never depends on recomputing them. Cross-decodability is
    asserted both directions."""
    import torch
    from PIL import Image

    cr = _load_codec_app()
    from compressai.models.master import (
        Guided_compresser,
        Master_compresser,
    )

    from lmic_tpu import zoo
    from lmic_tpu.utils import codec_cli
    from lmic_tpu.zoo.pretrained import (
        import_reference_coding_state,
        import_reference_state_dict,
    )

    torch.manual_seed(0)
    g_ref = Guided_compresser(channel=3)
    g_ref.eval()
    g_ref.update(force=True)
    m_ref = Master_compresser(width=128, height=128, channel=1)
    m_ref.eval()
    m_ref.update(force=True)

    rng = np.random.default_rng(11)
    xm_u8 = (rng.random((128, 128)) * 255).astype(np.uint8)
    xg_u8 = (rng.random((256, 256, 3)) * 255).astype(np.uint8)
    mpath, gpath = tmp_path / "master.png", tmp_path / "guide.png"
    Image.fromarray(xm_u8, mode="L").save(mpath)
    Image.fromarray(xg_u8).save(gpath)
    xm_t = torch.from_numpy(
        xm_u8.astype(np.float32) / 255.0
    )[None, None]
    xg_t = torch.from_numpy(
        xg_u8.astype(np.float32) / 255.0
    ).permute(2, 0, 1)[None]

    # reference flow: guide compress+decompress, master compress, file
    # written with the reference app's own functions
    with torch.no_grad():
        g_enc = g_ref.compress(xg_t)
        g_dec = g_ref.decompress(g_enc["strings"], g_enc["shape"])
        m_out = m_ref.compress(xm_t, g_dec["x_hat"])
        ref_rec = m_ref.decompress(
            {"strings": m_out["strings"], "shape": m_out["shape"],
             "beta": m_out["beta"], "gamma": m_out["gamma"]},
            {"x_hat": g_dec["x_hat"], "hidden": g_dec["hidden"]},
        )
    ref_file = tmp_path / "ref.bin"
    with open(ref_file, "wb") as f:
        cr.write_uchars(
            f, (codec_cli.REF_MODEL_IDS["master"], 0)
        )  # metric mse<<4 | quality-1 = 0
        cr.write_uints(f, (128, 128))
        cr.write_uchars(f, (8,))
        cr.write_floats(f, list(torch.squeeze(m_out["beta"])))
        cr.write_floats(f, list(torch.squeeze(m_out["gamma"])))
        cr.write_body(f, m_out["shape"], m_out["strings"])

    # our codecs on imported weights + adopted baked tables
    gc = zoo.create_model(
        "guided", 1, key=jax.random.key(0), input_size=(256, 256),
        channel=3,
    )
    gc = type(gc)(gc.module, import_reference_state_dict(
        "guided", g_ref.state_dict(), gc.variables
    ))
    assert import_reference_coding_state(g_ref.state_dict(), gc)
    mc = zoo.create_model(
        "master", 1, key=jax.random.key(0), input_size=(128, 128),
        channel=1,
    )
    mc = type(mc)(mc.module, import_reference_state_dict(
        "master", m_ref.state_dict(), mc.variables
    ))
    assert import_reference_coding_state(m_ref.state_dict(), mc)

    our_file = tmp_path / "ours.bin"
    codec_cli.encode_rgbt_ref(
        mpath, gpath, our_file, gc, mc, 1, channel=1
    )
    ours, refs = our_file.read_bytes(), ref_file.read_bytes()
    assert len(ours) == len(refs) and len(ours) > 11 + 512
    assert ours[:11] == refs[:11]  # header + geometry + bitdepth
    # transmitted side info: float agreement (last-ulp framework noise)
    b_o = np.frombuffer(ours[11:11 + 256], ">f4")  # big-endian wire
    g_o = np.frombuffer(ours[11 + 256:11 + 512], ">f4")
    b_r = np.frombuffer(refs[11:11 + 256], ">f4")
    g_r = np.frombuffer(refs[11 + 256:11 + 512], ">f4")
    np.testing.assert_allclose(b_o, b_r, atol=1e-6)
    np.testing.assert_allclose(g_o, g_r, atol=1e-6)
    # the coded body — every rANS stream — is byte-identical (empirical,
    # like the non-AR family's byte interop)
    assert ours[11 + 512:] == refs[11 + 512:]

    # our decoder reads the reference-written file
    out_png = tmp_path / "rec.png"
    with open(ref_file, "rb") as f:
        model_id, mq = codec_cli.read_uchars(f, 2)
        assert codec_cli.REF_ID_TO_MODEL[model_id] == "master"
        codec_cli.decode_rgbt_ref(
            f, gpath, out_png, lambda ch: gc, lambda ch: mc, channel=1
        )
    got = np.asarray(Image.open(out_png))
    want = np.clip(
        ref_rec["x_hat"][0, 0].numpy() * 255.0 + 0.5, 0, 255
    ).astype(np.uint8)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    # and the reference models decode OUR file's payload
    with open(our_file, "rb") as f:
        codec_cli.read_uchars(f, 2)
        codec_cli.read_uints(f, 2)
        codec_cli.read_uchars(f, 1)
        beta = torch.tensor(cr.read_floats(f, 64)).reshape(1, 64, 1, 1)
        gamma = torch.tensor(cr.read_floats(f, 64)).reshape(1, 64, 1, 1)
        strings, shape = cr.read_body(f)
    with torch.no_grad():
        rt = m_ref.decompress(
            {"strings": strings, "shape": list(shape), "beta": beta,
             "gamma": gamma},
            {"x_hat": g_dec["x_hat"], "hidden": g_dec["hidden"]},
        )
    np.testing.assert_allclose(
        rt["x_hat"].numpy(), ref_rec["x_hat"].numpy(), atol=1e-6
    )


@pytest.mark.slow
def test_video_file_byte_identical(tmp_path):
    """ssf2020: a reference-written video container (header + per-frame
    bodies, centered 128-pad) is byte-identical to
    `lmic-codec --container reference` on the same YUV input."""
    import torch

    cr = _load_codec_app()
    from compressai.models.video.google import ScaleSpaceFlow as RefSSF

    from lmic_tpu.utils import codec_cli
    from lmic_tpu.utils.video_eval import pad_frames, yuv420_frame_to_rgb
    from lmic_tpu.zoo.pretrained import load_reference_checkpoint

    torch.manual_seed(0)
    ref = RefSSF()
    ref.eval()
    ref.update(force=True)
    ckpt = str(tmp_path / "ssf-deploy.pth.tar")
    torch.save(ref.state_dict(), ckpt)
    codec = load_reference_checkpoint(
        "ssf2020", ckpt, quality=1, input_size=(128, 128)
    )

    # synthetic 3-frame 128x128 YUV420 clip
    W = H = 128
    T = 3
    rng = np.random.default_rng(3)
    raw = rng.integers(
        0, 255, T * (H * W + 2 * (H // 2) * (W // 2)), dtype=np.uint8
    )
    yuv_path = tmp_path / f"clip_{W}x{H}_30_yuv420.yuv"
    raw.tofile(yuv_path)

    # our writer
    our_file = tmp_path / "ours.bin"
    codec_cli.encode_video_ref(yuv_path, our_file, codec, 1)

    # reference writer: same header/body functions, reference model,
    # frames fed through OUR yuv->rgb conversion so float inputs match
    # (codec_rgbt.py:389-450)
    from lmic_tpu.datasets.rawvideo import RawVideoSequence

    seq = RawVideoSequence.from_file(str(yuv_path))
    ref_file = tmp_path / "ref.bin"
    header = cr.get_header("ssf2020", "mse", 1, T, cr.CodecType.VIDEO_CODEC)
    with open(ref_file, "wb") as f:
        cr.write_uchars(f, header[0:2])
        cr.write_uints(f, (seq.height, seq.width))
        cr.write_uchars(f, (seq.bitdepth,))
        cr.write_uints(f, (T,))
        x_ref = None
        with torch.no_grad():
            for i in range(T):
                x, _ = pad_frames(
                    yuv420_frame_to_rgb(seq[i], seq.bitdepth), p=128
                )
                x_t = torch.from_numpy(
                    np.transpose(x, (0, 3, 1, 2)).copy()
                )
                if i == 0:
                    x_out, out = ref.encode_keyframe(x_t)
                    cr.write_body(f, out["shape"], out["strings"])
                else:
                    x_out, out = ref.encode_inter(x_t, x_ref)
                    for shape, strings in zip(
                        out["shape"].items(), out["strings"].items()
                    ):
                        cr.write_body(f, shape[1], strings[1])
                x_ref = x_out.clamp(0, 1)
    seq.close()

    assert our_file.read_bytes() == ref_file.read_bytes()

    # our decoder reads the reference-written file end-to-end
    out_yuv = tmp_path / "rec.yuv"
    with open(ref_file, "rb") as f:
        model_id, code = codec_cli.read_uchars(f, 2)
        assert codec_cli.REF_ID_TO_MODEL[model_id] == "ssf2020"
        codec_cli.decode_video_ref(f, out_yuv, lambda a, q: codec, 1)
    assert out_yuv.stat().st_size == raw.nbytes
