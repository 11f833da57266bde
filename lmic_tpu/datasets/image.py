"""Image datasets (host-side numpy, channel-last HWC float32 in [0, 1]).

Reference behaviors (compressai/datasets/):
- `ImageFolder`   (image.py:69-124): rootdir/{train,test}/ flat image dirs,
  resize + random crop/flip for training.
- `ImageFolderT`  (image_rgbt_t.py:57-110): FLIR single modality — RGB
  images resized to 1280x1024, thermal loaded as 8-bit grayscale.
- `ImageFolderRGB` (image_rgbt_rgb.py:40-150): paired master+guide via path
  substitution RGB<->thermal_8_bit; random scale/crop/flip keeping the 2:1
  resolution ratio between master and guide.
- `ImageFolderTest` (image_rgbt_test.py:40-128): 20 fixed FLIR validation
  ids, center-cropped to codec-friendly sizes.

Plus a minimal `DataLoader` that shuffles, batches into stacked numpy
arrays, and (optionally) prefetches with a thread — the host side of a TPU
input pipeline (device transfer happens in the train loop with
`parallel.shard_batch`).
"""

from __future__ import annotations

import random
import threading
import queue as queue_mod
from pathlib import Path
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageFile

ImageFile.LOAD_TRUNCATED_IMAGES = True  # survive corrupt JPEGs (image.py:45)

IMG_EXTENSIONS = {".png", ".jpg", ".jpeg", ".bmp", ".tiff", ".webp"}

# FLIR ADAS validation ids fixed by the reference eval protocol
# (image_rgbt_test.py:40-61)
FLIR_TEST_IDS = [
    "08865", "08868", "08872", "08885", "08897", "08909", "08921", "08933",
    "08945", "08957", "08969", "08981", "08993", "09005", "09017", "09029",
    "09041", "09053", "09065", "09077",
]


def _to_float(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _list_images(d: Path):
    return sorted(
        f for f in d.iterdir()
        if f.is_file() and f.suffix.lower() in IMG_EXTENSIONS
    )


def random_crop(arr: np.ndarray, size: Tuple[int, int], rng: random.Random):
    h, w = size
    if arr.shape[0] < h or arr.shape[1] < w:
        raise ValueError(f"image {arr.shape} smaller than crop {size}")
    y = rng.randint(0, arr.shape[0] - h)
    x = rng.randint(0, arr.shape[1] - w)
    return arr[y : y + h, x : x + w]


def center_crop(arr: np.ndarray, size: Tuple[int, int]):
    h, w = size
    y = (arr.shape[0] - h) // 2
    x = (arr.shape[1] - w) // 2
    return arr[y : y + h, x : x + w]


class ImageFolder:
    """rootdir/{split}/ image files; training crop+flip pipeline."""

    def __init__(
        self,
        root,
        split: str = "train",
        patch_size: Tuple[int, int] = (256, 256),
        train: bool = True,
        resize: Optional[Tuple[int, int]] = None,
        seed: Optional[int] = None,
    ):
        splitdir = Path(root) / split
        if not splitdir.is_dir():
            raise RuntimeError(f'Invalid directory "{root}"')
        self.samples = _list_images(splitdir)
        self.patch_size = patch_size
        self.train = train
        self.resize = resize
        self._rng = random.Random(seed)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> np.ndarray:
        img = Image.open(self.samples[index]).convert("RGB")
        if self.resize is not None:
            img = img.resize(self.resize[::-1])  # PIL takes (W, H)
        arr = _to_float(img)
        if self.train:
            arr = random_crop(arr, self.patch_size, self._rng)
            if self._rng.random() > 0.5:
                arr = arr[:, ::-1].copy()
        else:
            arr = center_crop(arr, self.patch_size)
        return arr


class ImageFolderT(ImageFolder):
    """FLIR single-modality loader: RGB -> resize (1024, 1280); thermal
    stays 8-bit grayscale (image_rgbt_t.py:57-110)."""

    def __init__(self, root, split="train", patch_size=(256, 256),
                 train=True, channel: int = 3, seed=None):
        self.channel = channel
        resize = (1024, 1280) if channel == 3 else None
        super().__init__(root, split, patch_size, train, resize, seed)

    def __getitem__(self, index: int) -> np.ndarray:
        img = Image.open(self.samples[index])
        img = img.convert("RGB" if self.channel == 3 else "L")
        if self.resize is not None:
            img = img.resize(self.resize[::-1])
        arr = _to_float(img)
        if self.train:
            arr = random_crop(arr, self.patch_size, self._rng)
            if self._rng.random() > 0.5:
                arr = arr[:, ::-1].copy()
        return arr


TRAIN_SCALE_ARRAY = [1, 1.2, 1.4, 1.6, 1.8]  # image_rgbt_rgb.py:49


class ImageFolderRGB:
    """Paired master+guide FLIR loader with the reference's augmentation:
    random scale from TRAIN_SCALE_ARRAY, random crop keeping the 2:1
    master:guide resolution ratio, synchronized horizontal flip
    (image_rgbt_rgb.py:40-150).

    channel=3: master = RGB dir (2x res), guide = thermal_8_bit;
    channel=1: master = thermal_8_bit, guide = RGB resized to (1280, 1024).
    """

    def __init__(self, root, crop_size=(512, 640), channel: int = 3,
                 seed=None):
        self.root = str(root)
        self.channel = channel
        if channel == 3:
            guided_dir = Path(self.root.replace("RGB", "thermal_8_bit"))
        else:
            guided_dir = Path(self.root.replace("thermal_8_bit", "RGB"))
        splitdir = Path(self.root)
        if not splitdir.is_dir() or not guided_dir.is_dir():
            raise RuntimeError(f'Invalid directory "{root}"')
        self.samples = _list_images(splitdir)
        self.guided_samples = _list_images(guided_dir)
        self.crop_size = crop_size
        self._rng = random.Random(seed)

    def __len__(self):
        return len(self.samples)

    def _load_pair(self, index: int):
        if self.channel == 3:
            img = Image.open(self.samples[index]).convert("RGB")
            guided = Image.open(self.guided_samples[index])
        else:
            img = Image.open(self.samples[index])
            guided = (
                Image.open(self.guided_samples[index])
                .convert("RGB")
                .resize((1280, 1024))
            )
        return _to_float(img), _to_float(guided)

    def __getitem__(self, index: int):
        x, guided = self._load_pair(index)
        rng = self._rng
        H, W = self.crop_size

        if self.channel == 1:
            # thermal master: the reference applies NO scale/crop here —
            # full thermal (640x512) + full resized RGB guide (1280x1024),
            # synchronized flip only (image_rgbt_rgb.py:133-141)
            if rng.random() > 0.5:
                guided = guided[:, ::-1].copy()
                x = x[:, ::-1].copy()
            return x, guided

        # random resize (guide scaled, master kept at exactly 2x guide)
        scale = rng.choice(TRAIN_SCALE_ARRAY)
        sh = int(guided.shape[0] * scale)
        sw = int(guided.shape[1] * scale)
        guided = _resize_np(guided, (sh, sw))
        x = _resize_np(x, (2 * sh, 2 * sw))

        # random crop keeping the 2:1 ratio
        cy = rng.randint(0, guided.shape[0] - H)
        cx = rng.randint(0, guided.shape[1] - W)
        guided = guided[cy : cy + H, cx : cx + W]
        x = x[2 * cy : 2 * (cy + H), 2 * cx : 2 * (cx + W)]

        if rng.random() > 0.5:
            guided = guided[:, ::-1].copy()
            x = x[:, ::-1].copy()
        return x, guided


class ImageFolderTest:
    """Fixed FLIR validation pairs (image_rgbt_test.py:40-128). Returns
    (master, guide) center-cropped to (2*crop, crop)."""

    def __init__(self, root, crop_size=(512, 640), channel: int = 3,
                 test_ids: Optional[Sequence[str]] = None):
        self.root = str(root)
        self.channel = channel
        if channel == 3:
            guided_dir = Path(self.root.replace("RGB", "thermal_8_bit"))
        else:
            guided_dir = Path(self.root.replace("thermal_8_bit", "RGB"))
        ids = list(test_ids) if test_ids is not None else FLIR_TEST_IDS
        self.samples, self.guided_samples = [], []
        for f in _list_images(Path(self.root)):
            if any(i in f.stem for i in ids):
                self.samples.append(f)
        for f in _list_images(guided_dir):
            if any(i in f.stem for i in ids):
                self.guided_samples.append(f)
        self.crop_size = crop_size

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int):
        if self.channel == 3:
            x = _to_float(Image.open(self.samples[index]).convert("RGB"))
            guided = _to_float(Image.open(self.guided_samples[index]))
        else:
            x = _to_float(Image.open(self.samples[index]))
            guided = _to_float(
                Image.open(self.guided_samples[index])
                .convert("RGB")
                .resize((1280, 1024))
            )
        # The RGB modality is the 2x-resolution stream in the FLIR pairing
        # (reference resizes RGB to 1280x1024 against 640x512 thermal):
        # channel=3 -> master is RGB (2x), channel=1 -> guide is RGB (2x).
        H, W = self.crop_size
        if self.channel == 3:
            x = center_crop(x, (2 * H, 2 * W))
            guided = center_crop(guided, (H, W))
        else:
            x = center_crop(x, (H, W))
            guided = center_crop(guided, (2 * H, 2 * W))
        return x, guided


def _resize_np(arr: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize via PIL (matches torchvision Resize antialiasing
    closely enough for augmentation)."""
    h, w = size
    chans = []
    for c in range(arr.shape[-1]):
        img = Image.fromarray((arr[..., c] * 255).astype(np.uint8))
        chans.append(
            np.asarray(img.resize((w, h), Image.BILINEAR), np.float32) / 255.0
        )
    return np.stack(chans, axis=-1)


class DataLoader:
    """Minimal shuffling/batching loader producing stacked numpy batches.

    With `prefetch > 0`, batches are assembled in a background thread so
    host image decode overlaps device compute.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = random.Random(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        order = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            chunk = order[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def _assemble(self, idxs):
        items = [self.dataset[i] for i in idxs]
        if isinstance(items[0], tuple):
            return tuple(
                np.stack([it[j] for it in items]) for j in range(len(items[0]))
            )
        return np.stack(items)

    def __iter__(self):
        if self.prefetch <= 0:
            for idxs in self._index_batches():
                yield self._assemble(idxs)
            return

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            for idxs in self._index_batches():
                q.put(self._assemble(idxs))
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
