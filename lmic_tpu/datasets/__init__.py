from lmic_tpu.datasets.image import (
    DataLoader,
    ImageFolder,
    ImageFolderRGB,
    ImageFolderT,
    ImageFolderTest,
)
from lmic_tpu.datasets.rawvideo import (
    RawVideoSequence,
    VideoFormat,
    get_raw_video_file_info,
)
from lmic_tpu.datasets.video import VideoFolder

__all__ = [
    "DataLoader",
    "ImageFolder",
    "ImageFolderRGB",
    "ImageFolderT",
    "ImageFolderTest",
    "RawVideoSequence",
    "VideoFormat",
    "VideoFolder",
    "get_raw_video_file_info",
]
