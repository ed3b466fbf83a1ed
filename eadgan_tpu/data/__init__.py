"""Data ingest (layer L7 / primitive N6).

Host-side loaders replacing the reference's torch DataLoader pipelines:
MNIST idx files (MNIST/EAD-GAN_rpqmnxy.py:234-246), the dSprites npz
(dSprites/rp.py:236-246), and a CelebA-style image folder
(celebA/EAD-GAN_celebA.py:194-206).  Each loader synthesizes a small
structurally-similar dataset when the real files are absent (zero-egress
environments, CI), so every pipeline runs end to end anywhere.

Device feeding goes through :class:`eadgan_tpu.data.loader.Prefetcher`,
which stages the next batch's host->HBM copy while the current step
runs — the double-buffering the BASELINE north star asks for.
"""

from eadgan_tpu.data.loader import Prefetcher, epoch_batches
from eadgan_tpu.data.mnist import load_mnist
from eadgan_tpu.data.dsprites import load_dsprites
from eadgan_tpu.data.celeba import load_image_folder

__all__ = [
    "Prefetcher",
    "epoch_batches",
    "load_mnist",
    "load_dsprites",
    "load_image_folder",
]
