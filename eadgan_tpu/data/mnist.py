"""MNIST ingest: idx files resized to 32x32 and normalized to [-1, 1].

Parity with the reference's torchvision pipeline
(MNIST/EAD-GAN_rpqmnxy.py:234-246): Resize(32) bilinear, ToTensor,
Normalize(0.5, 0.5).  Reads the standard idx(.gz) files from a data
directory; synthesizes digit-like blobs when absent.
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import Tuple

import numpy as np

__all__ = ["load_mnist", "download_mnist"]

_IMAGES = "train-images-idx3-ubyte"
_LABELS = "train-labels-idx1-ubyte"

# Download-on-missing parity with the reference's torchvision call
# ``datasets.MNIST(..., download=True)`` (MNIST/EAD-GAN_rpqmnxy.py:234-246):
# same mirrors torchvision uses, same md5s it pins.
_MNIST_MIRRORS = (
    "https://ossci-datasets.s3.amazonaws.com/mnist/",
    "https://storage.googleapis.com/cvdf-datasets/mnist/",
)
_MNIST_MD5 = {
    _IMAGES + ".gz": "f68b3c2dcbeaaa9fbdd348bbdeb94873",
    _LABELS + ".gz": "d53e105ee54ea40749a09fcbcd1e9432",
}


def download_mnist(data_dir: str, timeout: float = 60.0) -> bool:
    """Fetch the training idx archives into ``data_dir`` when absent.

    Tries each mirror, verifies the torchvision-pinned md5, and writes
    atomically (``.part`` then rename) so an interrupted transfer never
    poses as a complete archive.  Returns True iff both files are
    present and verified afterwards; any network or checksum failure
    just returns False (callers degrade to the synthetic fallback).
    """
    import hashlib
    import urllib.request

    ok = True
    for name, md5 in _MNIST_MD5.items():
        dest = os.path.join(data_dir, name)
        if os.path.exists(dest) or os.path.exists(dest[: -len(".gz")]):
            continue
        os.makedirs(data_dir, exist_ok=True)
        fetched = False
        for mirror in _MNIST_MIRRORS:
            tmp = dest + ".part"
            try:
                with urllib.request.urlopen(mirror + name, timeout=timeout) as r:
                    payload = r.read()
                digest = hashlib.md5(payload).hexdigest()
                if digest != md5:
                    raise IOError(f"md5 mismatch for {name}: {digest}")
                with open(tmp, "wb") as f:
                    f.write(payload)
                os.replace(tmp, dest)
                print(f"downloaded {name} from {mirror}")
                fetched = True
                break
            except Exception as e:  # noqa: BLE001 — any failure -> next mirror
                print(f"mnist download failed ({mirror + name}): {e}")
                if os.path.exists(tmp):
                    os.remove(tmp)
        ok &= fetched
    return ok


def _open_maybe_gz(path):
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rb")
    return open(path, "rb")


def _read_idx_images(path) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        assert magic == 2051, f"bad idx magic {magic}"
        return np.frombuffer(f.read(n * rows * cols), np.uint8).reshape(n, rows, cols)


def _read_idx_labels(path) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        magic, n = struct.unpack(">II", f.read(8))
        assert magic == 2049, f"bad idx magic {magic}"
        return np.frombuffer(f.read(n), np.uint8).astype(np.int32)


def _resize_bilinear(imgs: np.ndarray, size: int) -> np.ndarray:
    """Vectorized bilinear resize (align_corners=False convention, like
    PIL/torchvision's default for the 28->32 upsample)."""
    n, h, w = imgs.shape
    ys = (np.arange(size) + 0.5) * h / size - 0.5
    xs = (np.arange(size) + 0.5) * w / size - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int32)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int32)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[None, :, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, None, :]
    f = imgs.astype(np.float32)
    fy0, fy1 = f[:, y0], f[:, y1]  # one row-gather each, not two
    top = fy0[:, :, x0] * (1 - wx) + fy0[:, :, x1] * wx
    bot = fy1[:, :, x0] * (1 - wx) + fy1[:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def _synthetic_mnist(n=2048, seed=0) -> Tuple[np.ndarray, np.ndarray]:
    """Digit-like strokes: one blob per class position pattern."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, n).astype(np.int32)
    imgs = np.zeros((n, 28, 28), np.float32)
    ys, xs = np.mgrid[0:28, 0:28].astype(np.float32)
    for i, lab in enumerate(labels):
        ang = 2 * np.pi * lab / 10
        cx, cy = 14 + 6 * np.cos(ang), 14 + 6 * np.sin(ang)
        blob = np.exp(-(((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 9.0)))
        ring = np.exp(-((np.hypot(xs - 14, ys - 14) - (4 + lab * 0.7)) ** 2) / 4.0)
        imgs[i] = np.clip(blob + 0.7 * ring + 0.05 * rng.normal(size=(28, 28)), 0, 1) * 255
    return imgs.astype(np.uint8), labels


def load_mnist(
    data_dir: str = "data/mnist",
    img_size: int = 32,
    allow_synthetic: bool = True,
    download: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (images (N, 32, 32, 1) float32 in [-1, 1], labels (N,)).

    ``download=True`` fetches the idx archives on first use like the
    reference's ``datasets.MNIST(..., download=True)``; on failure (no
    egress) it degrades to the synthetic fallback exactly as if the
    files were absent."""
    img_path = os.path.join(data_dir, _IMAGES)
    lab_path = os.path.join(data_dir, _LABELS)

    def _have(path):
        return os.path.exists(path) or os.path.exists(path + ".gz")

    # Trigger on EITHER file missing: a partially-successful earlier
    # fetch (images landed, labels failed) must retry the labels rather
    # than crash below or permanently shadow the synthetic fallback.
    if download and not (_have(img_path) and _have(lab_path)):
        download_mnist(data_dir)
    if _have(img_path) and _have(lab_path):
        raw = _read_idx_images(img_path)
        labels = _read_idx_labels(lab_path)
    elif allow_synthetic:
        # EADGAN_SYNTH_N scales the stand-in dataset (real train split is
        # 60k); tiny epochs clamp the chained engine's windows — see
        # data/celeba.py.
        raw, labels = _synthetic_mnist(
            n=int(os.environ.get("EADGAN_SYNTH_N", "2048"))
        )
    else:
        raise FileNotFoundError(img_path)
    resized = _resize_bilinear(raw, img_size) / 255.0
    imgs = ((resized - 0.5) / 0.5).astype(np.float32)[..., None]
    return imgs, labels
