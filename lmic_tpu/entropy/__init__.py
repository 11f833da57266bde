from lmic_tpu.entropy.coder import (
    BufferedRansEncoder,
    CdfTable,
    RansDecoder,
    decode_with_indexes,
    encode_with_indexes,
)
from lmic_tpu.entropy.entropy_models import (
    EBState,
    EntropyBottleneck,
    GaussianConditional,
    GCState,
    eb_update,
    get_scale_table,
)

__all__ = [
    "BufferedRansEncoder",
    "CdfTable",
    "RansDecoder",
    "decode_with_indexes",
    "encode_with_indexes",
    "EntropyBottleneck",
    "EBState",
    "GaussianConditional",
    "GCState",
    "eb_update",
    "get_scale_table",
]
