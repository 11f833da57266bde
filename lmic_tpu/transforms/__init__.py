from lmic_tpu.transforms.functional import (
    rgb2ycbcr,
    ycbcr2rgb,
    yuv_420_to_444,
    yuv_444_to_420,
)

__all__ = ["rgb2ycbcr", "ycbcr2rgb", "yuv_420_to_444", "yuv_444_to_420"]
