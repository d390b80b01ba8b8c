"""Input pipelines: PIL decode + augment, threaded prefetch into device arrays.

Torch-free replacement for the reference's torch.utils.data stack:

* :class:`ImageFolderDataset`  — data_loader.py ``Dataset`` (26-48): shorter-side
  resize -> random crop 256 -> random hflip, [0,1] float.
* :class:`NpyFolderDataset`    — data_loader.py ``Dataset_npy`` (11-24).
* :class:`CenterCropDataset`   — data_loader.py ``TestDataset`` (50-73).
* :class:`ContentStylePairDataset` — data_loader.py ``ContentStylePair`` (75-112).
* :class:`PairGridDataset`     — PytorchWCT/data_loader.py ``Dataset`` (20-76):
  the inference content x style cross product with picked-mark filtering and
  the texture-synthesis branch (random-noise content).
* :class:`Loader`              — batching + shuffling + a thread pool doing
  decode/augment off the main thread (the reference uses a single-worker
  DataLoader, main.py:72), with double-buffered prefetch.

Outputs are NHWC float32 numpy arrays; the trainer moves them to device.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image, ImageFile

Image.MAX_IMAGE_PIXELS = None          # UHD inputs (reference data_loader.py:3)
ImageFile.LOAD_TRUNCATED_IMAGES = True

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg")

from . import native_codec  # noqa: E402  (C++ libjpeg fast path; PIL fallback)

__all__ = [
    "is_img",
    "load_image",
    "resize_shorter_side",
    "ImageFolderDataset",
    "NpyFolderDataset",
    "CenterCropDataset",
    "ContentStylePairDataset",
    "PairGridDataset",
    "Loader",
]


def is_img(name: str) -> bool:
    return name.lower().endswith(IMG_EXTENSIONS)


def load_image(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


def resize_shorter_side(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w < h:
        return img.resize((size, max(1, int(h * size / w))))
    return img.resize((max(1, int(w * size / h)), size))


def _to_float(img: Image.Image) -> np.ndarray:
    return np.asarray(img, np.float32) / 255.0


def _random_crop(arr: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    h, w = arr.shape[:2]
    if h < size or w < size:  # upscale pathological small images like RandomCrop would error; pad reflect
        ph, pw = max(0, size - h), max(0, size - w)
        arr = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = arr.shape[:2]
    i = int(rng.integers(0, h - size + 1))
    j = int(rng.integers(0, w - size + 1))
    return arr[i: i + size, j: j + size]


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    i, j = max(0, (h - size) // 2), max(0, (w - size) // 2)
    return arr[i: i + size, j: j + size]


class _SafeRng:
    """Thread-safe random stream: spawns an independent child generator per
    draw (numpy Generators are NOT thread-safe; the Loader calls datasets from
    a thread pool). Deterministic given the seed and draw order."""

    def __init__(self, seed: int):
        self._seq = np.random.SeedSequence(seed)
        self._lock = threading.Lock()

    def child(self) -> np.random.Generator:
        with self._lock:
            (child,) = self._seq.spawn(1)
        return np.random.default_rng(child)


class ImageFolderDataset:
    """Training content images: resize shorter side, random 256-crop, hflip.

    ``aug="strong"`` (opt-in; the reference's recipe is crop+hflip only,
    data_loader.py:26-48) layers continuous scale jitter (log-uniform
    re-resize of the cached array down to the crop size), the full dihedral
    group (flips + 90-degree rotations), random channel permutation, and a
    mild intensity affine on top. Built for the in-container training-quality
    oracle, where the corpus is a few hundred tiles from ~8 source images
    rather than COCO's 118k: with crop+hflip alone the student reaches the
    shipped decoder's TRAIN loss but generalizes ~4 dB short on held-out
    content (docs/TRAINING.md) — the gap is data diversity, which these
    label-free-valid transforms (reconstruction target = the input itself)
    partially buy back."""

    def __init__(self, img_dir: str, shorter_side: int = 300, crop: int = 256, seed: int = 0,
                 cache: bool = False, uint8: bool = False, aug: str = "flip"):
        self.paths = sorted(
            os.path.join(img_dir, f) for f in os.listdir(img_dir) if is_img(f))
        if not self.paths:
            raise FileNotFoundError(f"no images in {img_dir}")
        self.shorter_side = shorter_side
        self.crop = crop
        self._rng = _SafeRng(seed)
        # Opt-in decoded-image RAM cache: augmentation is crop+flip over the
        # *resized* array, so the post-resize float image is reusable across
        # epochs. On a 1-core host JPEG decode dominates the step otherwise.
        # Unsuitable for COCO-scale dirs (118k images ~ 170 GB) — caller opts in.
        self._cache: dict[str, np.ndarray] | None = {} if cache else None
        # uint8 output: host->device batches as raw bytes (the trainer
        # normalizes on device); also shrinks the cache 4x.
        self.uint8 = uint8
        if aug not in ("flip", "strong"):
            raise ValueError(f"unknown aug mode {aug!r}")
        self.aug = aug

    def __len__(self) -> int:
        return len(self.paths)

    def _decode(self, path: str) -> np.ndarray:
        arr = None
        if self.shorter_side and path.lower().endswith((".jpg", ".jpeg")):
            # native decode with DCT-domain downscale; releases the GIL so the
            # Loader's worker threads decode in parallel
            with open(path, "rb") as fh:
                raw = native_codec.decode_jpeg_shorter_side(fh.read(), self.shorter_side)
            if raw is not None:
                arr = raw if self.uint8 else raw.astype(np.float32) / 255.0
        if arr is None:
            img = load_image(path)
            if self.shorter_side:
                img = resize_shorter_side(img, self.shorter_side)
            arr = np.asarray(img, np.uint8) if self.uint8 else _to_float(img)
        return arr

    def _cached(self, path: str) -> np.ndarray:
        if self._cache is not None:
            arr = self._cache.get(path)
            if arr is None:
                # benign race under Loader threads: worst case both decode once
                arr = self._cache[path] = self._decode(path)
            return arr
        return self._decode(path)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, str]:
        path = self.paths[idx]
        arr = self._cached(path)
        rng = self._rng.child()
        if self.aug == "strong":
            out = self._strong_aug(arr, rng)
            # CutMix-style collage (p=0.25): paste a random rectangle of a
            # second augmented crop — synthesizes compositions and sharp
            # occlusion boundaries the tiny source corpus lacks (the
            # reconstruction target is still the input itself, so any
            # composite is a valid sample)
            if rng.random() < 0.25:
                j = int(rng.integers(0, len(self.paths)))
                other = self._strong_aug(self._cached(self.paths[j]), rng)
                ch = int(rng.integers(self.crop // 4, 3 * self.crop // 4))
                cw = int(rng.integers(self.crop // 4, 3 * self.crop // 4))
                i0 = int(rng.integers(0, self.crop - ch + 1))
                j0 = int(rng.integers(0, self.crop - cw + 1))
                out = out.copy()
                out[i0:i0 + ch, j0:j0 + cw] = other[i0:i0 + ch, j0:j0 + cw]
            return out, path
        arr = _random_crop(arr, self.crop, rng)
        if rng.random() < 0.5:
            arr = arr[:, ::-1].copy()
        return arr, path

    def _strong_aug(self, arr: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        h, w = arr.shape[:2]
        short = min(h, w)
        # continuous scale jitter: log-uniform target shorter side in
        # [crop, cached shorter side] — with pyramid-tiled sources this
        # fills the gaps between the discrete pyramid levels
        if short > self.crop:
            t = int(round(float(np.exp(rng.uniform(
                np.log(self.crop), np.log(short))))))
            if t < short:
                nh = max(self.crop, int(round(h * t / short)))
                nw = max(self.crop, int(round(w * t / short)))
                a8 = arr if arr.dtype == np.uint8 else (
                    arr * 255).astype(np.uint8)
                im = Image.fromarray(a8).resize((nw, nh), Image.BILINEAR)
                a8 = np.asarray(im, np.uint8)
                arr = a8 if self.uint8 else a8.astype(np.float32) / 255.0
        arr = _random_crop(arr, self.crop, rng)
        k = int(rng.integers(0, 8))  # dihedral group (square crop)
        if k & 1:
            arr = arr[:, ::-1]
        if k & 2:
            arr = arr[::-1]
        if k & 4:
            arr = np.transpose(arr, (1, 0, 2))
        if rng.random() < 0.5:
            arr = arr[..., rng.permutation(3)]
        if rng.random() < 0.5:  # mild intensity affine
            a = float(rng.uniform(0.85, 1.15))
            b = float(rng.uniform(-0.08, 0.08))
            if arr.dtype == np.uint8:
                arr = np.clip(arr.astype(np.float32) * a + b * 255.0,
                              0.0, 255.0).astype(np.uint8)
            else:
                arr = np.clip(arr * a + b, 0.0, 1.0)
        return np.ascontiguousarray(arr)


class NpyFolderDataset:
    """Pre-decoded .npy image folders (data_loader.py:11-24)."""

    def __init__(self, img_dir: str, crop: int = 256, seed: int = 0):
        self.paths = sorted(
            os.path.join(img_dir, f) for f in os.listdir(img_dir) if f.endswith(".npy"))
        if not self.paths:
            raise FileNotFoundError(f"no .npy files in {img_dir}")
        self.crop = crop
        self._rng = _SafeRng(seed)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, str]:
        arr = np.load(self.paths[idx])
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        rng = self._rng.child()
        arr = _random_crop(arr.astype(np.float32), self.crop, rng)
        if rng.random() < 0.5:
            arr = arr[:, ::-1].copy()
        return arr, self.paths[idx]


class CenterCropDataset:
    """Eval images: resize shorter side + deterministic center crop."""

    def __init__(self, img_dir: str, shorter_side: int = 300, crop: int = 256):
        self.paths = sorted(
            os.path.join(img_dir, f) for f in os.listdir(img_dir) if is_img(f))
        self.shorter_side = shorter_side
        self.crop = crop

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, str]:
        img = load_image(self.paths[idx])
        if self.shorter_side:
            img = resize_shorter_side(img, self.shorter_side)
        return _center_crop(_to_float(img), self.crop), self.paths[idx]


class ContentStylePairDataset:
    """Zipped content/style folders with training augmentation."""

    def __init__(self, content_dir: str, style_dir: str, shorter_side: int = 300,
                 crop: int = 256, seed: int = 0):
        self.content = ImageFolderDataset(content_dir, shorter_side, crop, seed)
        self.style = ImageFolderDataset(style_dir, shorter_side, crop, seed + 1)

    def __len__(self) -> int:
        return max(len(self.content), len(self.style))

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        c, _ = self.content[idx % len(self.content)]
        s, _ = self.style[idx % len(self.style)]
        return c, s


class PairGridDataset:
    """Inference pairs: content x style cross product, or texture synthesis.

    Matches PytorchWCT/data_loader.py: picked-mark substring filters (32-36),
    optional shorter-side resizes (52-55), output name ``content+style.jpg``
    (58-59), and the synthesis branch pairing each texture with uniform noise
    of the same size (61-76; the reference's ``torch.rand_like(PIL)`` there is
    broken — this is what it evidently intended).
    """

    def __init__(self, content_dir: str, style_dir: str, *, texture_dir: str | None = None,
                 content_size: int = 0, style_size: int = 0,
                 picked_content_mark: str = "", picked_style_mark: str = "",
                 synthesis: bool = False, seed: int = 0):
        self.synthesis = synthesis
        self.content_size = content_size
        self.style_size = style_size
        self.rng = np.random.default_rng(seed)
        if synthesis:
            self.textures = sorted(
                os.path.join(texture_dir, f) for f in os.listdir(texture_dir) if is_img(f))
            self.pairs = [(t, t) for t in self.textures]
        else:
            contents = sorted(f for f in os.listdir(content_dir)
                              if is_img(f) and picked_content_mark in f)
            styles = sorted(f for f in os.listdir(style_dir)
                            if is_img(f) and picked_style_mark in f)
            self.pairs = [(os.path.join(content_dir, c), os.path.join(style_dir, s))
                          for c in contents for s in styles]

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray, str]:
        cpath, spath = self.pairs[idx]
        style = load_image(spath)
        if self.style_size:
            style = resize_shorter_side(style, self.style_size)
        style = _to_float(style)
        if self.synthesis:
            content = self.rng.random(style.shape, dtype=np.float32)
            name = os.path.basename(cpath).rsplit(".", 1)[0] + ".jpg"
        else:
            content = load_image(cpath)
            if self.content_size:
                content = resize_shorter_side(content, self.content_size)
            content = _to_float(content)
            name = (os.path.basename(cpath).rsplit(".", 1)[0] + "+" +
                    os.path.basename(spath).rsplit(".", 1)[0] + ".jpg")
        return content, style, name


class Loader:
    """Shuffling, batching, threaded-prefetch iterator over a dataset.

    Decode/augment runs in a worker pool; up to ``prefetch`` ready batches are
    buffered so the accelerator never waits on PIL.
    """

    def __init__(self, dataset, batch_size: int = 16, *, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8, prefetch: int = 2,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        for i in range(len(self)):
            yield order[i * self.batch_size: (i + 1) * self.batch_size]

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            """Put with stop-responsive timeout; False means the consumer left."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idxs in self._batches():
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, idxs))
                        first = items[0]
                        if isinstance(first, tuple):
                            cols = []
                            for j, col in enumerate(zip(*items)):
                                if isinstance(first[j], np.ndarray):
                                    cols.append(np.stack(col))
                                else:
                                    cols.append(list(col))
                            batch = tuple(cols)
                        else:
                            batch = np.stack(items)
                        if not _put(batch):
                            return
                    _put(None)
            except BaseException as e:  # noqa: BLE001 — a dataset error
                # (corrupt image, OSError, ...) must surface on the consumer
                # side, not leave it blocked on q.get() forever
                _put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
