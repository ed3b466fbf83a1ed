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
