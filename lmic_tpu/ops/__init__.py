from lmic_tpu.ops.math import (
    LowerBound,
    NonNegativeParametrizer,
    lower_bound,
    quantize_ste,
    ste_round,
)
from lmic_tpu.ops.cdf import pmf_to_quantized_cdf, batched_pmf_to_quantized_cdf

__all__ = [
    "LowerBound",
    "NonNegativeParametrizer",
    "lower_bound",
    "ste_round",
    "quantize_ste",
    "pmf_to_quantized_cdf",
    "batched_pmf_to_quantized_cdf",
]
