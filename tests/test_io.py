"""Tests for data loaders, grid rendering (golden vs torchvision), and
checkpoint save/restore round trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eadgan_tpu.data import epoch_batches, load_dsprites, load_image_folder, load_mnist
from eadgan_tpu.data.loader import Prefetcher
from eadgan_tpu.sample import make_grid, save_image
from eadgan_tpu.train.checkpoint import (
    latest_step,
    restore_model,
    restore_pytree,
    save_model,
    save_pytree,
)
from eadgan_tpu.train.state import ModelVars


def test_synthetic_dsprites_structure():
    data = load_dsprites("/nonexistent_dir_xyz", allow_synthetic=True)
    assert data.synthetic
    assert data.imgs.ndim == 3 and data.imgs.shape[1:] == (64, 64)
    assert set(np.unique(data.imgs)) <= {0, 1}
    assert data.latents_sizes is not None
    assert int(np.prod(data.latents_sizes)) == data.imgs.shape[0]


def test_synthetic_mnist_shapes():
    imgs, labels = load_mnist("/nonexistent_dir_xyz")
    assert imgs.shape[1:] == (32, 32, 1)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
    assert labels.shape[0] == imgs.shape[0]


def test_synthetic_celeba_range():
    imgs = load_image_folder("/nonexistent_dir_xyz")
    assert imgs.shape[1:] == (64, 64, 3)
    assert imgs.dtype == np.uint8  # normalized per batch in the native path


def test_epoch_batches_and_prefetcher(rng):
    data = np.arange(100, dtype=np.float32)[:, None]
    batches = list(epoch_batches(data, 8, rng))
    assert len(batches) == 12  # drop_last
    seen = np.concatenate(batches)[:, 0]
    assert len(np.unique(seen)) == 96  # no duplicates within epoch

    out = list(Prefetcher(epoch_batches(data, 8, rng)))
    assert len(out) == 12
    assert all(isinstance(b, jax.Array) for b in out)


def test_prefetcher_propagates_errors():
    def bad_gen():
        yield np.zeros((2, 2), np.float32)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(Prefetcher(bad_gen()))


def test_make_grid_layout(rng):
    """torchvision layout: 2px padding border, row-major cells, zero
    padding for missing cells (hand-computed; torchvision itself is not
    in this image)."""
    imgs = rng.uniform(0.1, 1, (3, 4, 4, 1)).astype(np.float32)
    grid = make_grid(imgs, nrow=2, padding=2)
    # 2 rows x 2 cols of 4x4 cells with 2px padding everywhere
    assert grid.shape == (2 * (4 + 2) + 2, 2 * (4 + 2) + 2, 1)
    np.testing.assert_allclose(grid[2:6, 2:6], imgs[0])
    np.testing.assert_allclose(grid[2:6, 8:12], imgs[1])
    np.testing.assert_allclose(grid[8:12, 2:6], imgs[2])
    np.testing.assert_allclose(grid[8:12, 8:12], 0.0)  # missing cell
    assert np.all(grid[0:2] == 0) and np.all(grid[:, 0:2] == 0)  # border


def test_save_image_writes_png(tmp_path, rng):
    img = rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32)
    path = str(tmp_path / "grid.png")
    save_image(img, path, nrow=2)
    from PIL import Image

    with Image.open(path) as im:
        assert im.size[0] > 8 and im.size[1] > 8


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(5, dtype=jnp.float32),
        "b": {"c": jnp.ones((2, 3))},
        "step": jnp.asarray(7),
    }
    path = str(tmp_path / "state.ckpt")
    save_pytree(path, tree)
    zero = jax.tree.map(jnp.zeros_like, tree)
    restored = restore_pytree(path, zero)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_allclose(a, b)


def test_model_checkpoint_roundtrip(tmp_path):
    from eadgan_tpu.models import SpritesEncoderPxy

    model = SpritesEncoderPxy()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    mv = ModelVars.create(variables)
    path = str(tmp_path / "encoder_pxy_0.pt")
    save_model(path, mv)

    fresh = ModelVars.create(model.init(jax.random.PRNGKey(9), jnp.zeros((1, 64, 64, 1))))
    restored = restore_model(path, fresh)
    for a, b in zip(jax.tree.leaves(mv.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(a, b)


def test_latest_step(tmp_path):
    for s in (0, 500, 1500):
        open(tmp_path / f"rp_train_state_{s}.ckpt", "w").close()
    assert latest_step(str(tmp_path), "rp_train_state") == 1500
    assert latest_step(str(tmp_path), "nothing") == -1


def test_run_epochs_redraws_flips_per_batch():
    """random_flip=True must re-draw the horizontal flip on every batch
    fetch (reference torchvision RandomHorizontalFlip semantics,
    celebA/EAD-GAN_celebA.py:199) — the same image must appear in both
    orientations across epochs, unlike a static per-image load-time draw."""
    from eadgan_tpu.cli.common import run_epochs

    n, size = 16, 8
    data = np.zeros((n, size, size, 3), np.uint8)
    data[:, :, 0, :] = 255  # left column bright: orientation is observable

    seen = []  # list of (epoch-less) per-image flip booleans, in fetch order

    class S:
        step = jnp.asarray(0)

    def step_fn(state, batch):
        batch = np.asarray(batch)
        flipped = batch[:, 0, -1, 0] > 0  # bright column moved to the right
        seen.append(flipped)
        return state, {}

    run_epochs(
        n_epochs=6, data=data, labels=None, batch_size=n, state=S(),
        step_fn=step_fn, on_batch=lambda *a: None, seed=0,
        scale=1 / 127.5, shift=-1.0, random_flip=True,
    )
    flips = np.stack(seen)  # (6 epochs, n images) — batch == whole dataset
    assert flips.any() and not flips.all()  # both orientations occur
    # a static draw would make every epoch row identical
    assert any(not np.array_equal(flips[0], flips[e]) for e in range(1, 6))


def test_mnist_resize_matches_pil(rng):
    """The 28->32 bilinear upscale must match PIL (what torchvision's
    Resize used in the reference's era) to ~1 gray level."""
    from PIL import Image

    from eadgan_tpu.data.mnist import _resize_bilinear

    imgs = rng.integers(0, 256, (4, 28, 28), dtype=np.uint8)
    ours = _resize_bilinear(imgs, 32)
    for i in range(4):
        pil = np.asarray(
            Image.fromarray(imgs[i]).resize((32, 32), Image.BILINEAR), np.float32
        )
        np.testing.assert_allclose(ours[i], pil, atol=1.5)


def test_celeba_decode_torchvision_semantics(tmp_path, rng):
    """The JPEG ingest must reproduce the reference transform chain
    Resize(64) -> CenterCrop(64) (celebA/EAD-GAN_celebA.py:194-197)
    bit-exactly.  torchvision is not in this image, so the expected
    values replicate its exact published formulas on the PIL backend:

    * Resize(int): shorter side -> size, longer side ->
      ``int(size * long / short)`` (floor), then PIL ``im.resize(...,
      BILINEAR)`` — torchvision's PIL path IS pil.resize, so matching
      the size computation makes the pixels identical by construction.
    * CenterCrop: offsets ``int(round((dim - size) / 2.0))`` — rounds
      half-pixels UP for odd margins (floor division would differ by
      one row/column on odd-sized intermediates like CelebA's
      178x218 -> 64x78).
    """
    from PIL import Image

    from eadgan_tpu.data.celeba import (
        _decode_resize_crop,
        torchvision_center_crop_box,
        torchvision_resize_size,
    )

    # size-computation parity over shapes incl. the real CelebA aligned
    # 178x218 and odd/even margins in both orientations
    cases = [(178, 218), (218, 178), (100, 101), (65, 64), (64, 64), (130, 97)]
    for w, h in cases:
        nw, nh = torchvision_resize_size(w, h, 64)
        short, long = (w, h) if w <= h else (h, w)
        assert min(nw, nh) == 64
        assert max(nw, nh) == int(64 * long / short)  # floor, not round
    assert torchvision_resize_size(178, 218, 64) == (64, 78)
    # odd crop margin rounds up: 78-64=14 -> top 7; 79-64=15 -> top 8
    assert torchvision_center_crop_box(64, 79, 64) == (0, 8, 64, 72)
    assert torchvision_center_crop_box(64, 78, 64) == (0, 7, 64, 71)

    # end-to-end decode parity vs an inline replica of the torchvision
    # PIL-backend pipeline
    for w, h in [(178, 218), (90, 64), (101, 67)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"img_{w}x{h}.png"  # png: lossless, isolates geometry
        Image.fromarray(arr).save(p)

        ours = _decode_resize_crop(str(p), 64)

        im = Image.open(p).convert("RGB")
        short, long = (w, h) if w <= h else (h, w)
        new_short, new_long = 64, int(64 * long / short)
        nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
        im = im.resize((nw, nh), Image.BILINEAR)
        top = int(round((nh - 64) / 2.0))
        left = int(round((nw - 64) / 2.0))
        expected = np.asarray(im.crop((left, top, left + 64, top + 64)), np.uint8)

        np.testing.assert_array_equal(ours, expected)


def test_mnist_download_on_missing(tmp_path, monkeypatch):
    """download=True must fetch-and-verify missing idx archives (the
    reference's datasets.MNIST(download=True), MNIST/EAD-GAN_rpqmnxy.py:
    234-246): atomic write, md5 check, mirror fallback, and graceful
    synthetic degrade when every mirror fails."""
    import gzip as _gzip
    import hashlib
    import io
    import struct
    import urllib.request

    from eadgan_tpu.data import mnist as mnist_mod

    n = 8
    img_raw = struct.pack(">IIII", 2051, n, 28, 28) + bytes(
        (i * 7) % 256 for i in range(n * 28 * 28)
    )
    lab_raw = struct.pack(">II", 2049, n) + bytes(i % 10 for i in range(n))
    blobs = {
        "train-images-idx3-ubyte.gz": _gzip.compress(img_raw),
        "train-labels-idx1-ubyte.gz": _gzip.compress(lab_raw),
    }
    monkeypatch.setattr(
        mnist_mod,
        "_MNIST_MD5",
        {k: hashlib.md5(v).hexdigest() for k, v in blobs.items()},
    )

    calls = []

    class FakeResponse(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=None):
        calls.append(url)
        name = url.rsplit("/", 1)[1]
        if "first-mirror-down" in url or len(calls) == 1:
            raise OSError("mirror down")
        return FakeResponse(blobs[name])

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    imgs, labels = mnist_mod.load_mnist(str(tmp_path / "mnist"), 32, download=True)
    assert imgs.shape == (n, 32, 32, 1)
    assert list(labels) == [i % 10 for i in range(n)]
    # first mirror failed -> second used; no stray .part left behind
    assert len(calls) >= 2
    assert not list(tmp_path.glob("mnist/*.part"))

    # checksum mismatch must reject the file and degrade to synthetic
    monkeypatch.setattr(
        mnist_mod, "_MNIST_MD5", {k: "0" * 32 for k in blobs}
    )
    imgs2, labels2 = mnist_mod.load_mnist(str(tmp_path / "bad"), 32, download=True)
    assert imgs2.shape[0] == 2048  # synthetic fallback size
    assert not list(tmp_path.glob("bad/*.gz"))

    # total network failure -> synthetic, no raise
    def down(url, timeout=None):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlopen", down)
    imgs3, _ = mnist_mod.load_mnist(str(tmp_path / "off"), 32, download=True)
    assert imgs3.shape[0] == 2048

    # partial earlier fetch (images present, labels missing) must not
    # crash on the label read OR permanently shadow the fallback: with
    # the network still down it degrades to synthetic, and once the
    # network returns it re-fetches only the missing labels file
    part = tmp_path / "partial"
    part.mkdir()
    (part / "train-images-idx3-ubyte.gz").write_bytes(blobs["train-images-idx3-ubyte.gz"])
    monkeypatch.setattr(
        mnist_mod,
        "_MNIST_MD5",
        {k: hashlib.md5(v).hexdigest() for k, v in blobs.items()},
    )
    imgs4, _ = mnist_mod.load_mnist(str(part), 32, download=True)
    assert imgs4.shape[0] == 2048  # degraded, no FileNotFoundError
    imgs5, _ = mnist_mod.load_mnist(str(part), 32, download=False)
    assert imgs5.shape[0] == 2048  # --no_download path degrades too

    calls.clear()
    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    imgs6, labels6 = mnist_mod.load_mnist(str(part), 32, download=True)
    assert imgs6.shape == (n, 32, 32, 1)
    assert list(labels6) == [i % 10 for i in range(n)]
    assert all("labels" in url for url in calls)  # images not re-fetched
