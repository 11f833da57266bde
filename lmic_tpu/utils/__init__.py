from lmic_tpu.utils import checkpoint, metrics, train

__all__ = ["checkpoint", "metrics", "train"]
