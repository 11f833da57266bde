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


def prefetch(iterable, size: int = 2):
    """Iterate `iterable` on a background thread with a bounded queue —
    host-side batch preparation (PIL decode, crop, augment) overlaps the
    accelerator step instead of serializing with it. The TPU-native
    analogue of the reference's DataLoader(num_workers=...) (decode
    releases the GIL in PIL/numpy)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    DONE = object()
    stop = threading.Event()

    def put(item) -> bool:
        """Stop-aware put; False when the consumer went away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not put(item):
                    return
            put(DONE)
        except BaseException as e:  # surface errors at the consumer
            put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()  # release the worker if the consumer stopped early


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
    "prefetch",
]
