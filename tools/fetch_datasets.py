"""Dataset acquisition helper (run on a machine with network access).

The reference pipelines expect (README.md of the reference):

* MNIST idx files under ``data/mnist/`` — torchvision's download or
  https://storage.googleapis.com/cvdf-datasets/mnist/
* ``dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz`` in the working
  directory — https://github.com/google-deepmind/dsprites-dataset
* CelebA aligned JPEGs under ``data/<class>/*.jpg`` —
  https://mmlab.ie.cuhk.edu.hk/projects/CelebA.html

In zero-egress environments every eadgan_tpu loader falls back to a
synthetic structurally-equivalent dataset automatically; this script
just fetches the real archives when a network exists.
"""

import os
import sys
import urllib.request

MNIST_BASE = "https://storage.googleapis.com/cvdf-datasets/mnist/"
MNIST_FILES = [
    "train-images-idx3-ubyte.gz",
    "train-labels-idx1-ubyte.gz",
]
DSPRITES_URL = (
    "https://github.com/google-deepmind/dsprites-dataset/raw/master/"
    "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz"
)


def fetch(url: str, dest: str) -> None:
    if os.path.exists(dest):
        print(f"exists: {dest}")
        return
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    print(f"fetching {url} -> {dest}")
    # download to a temp name so an interrupted transfer is never
    # mistaken for a complete archive on the next run
    tmp = dest + ".part"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, dest)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    for name in MNIST_FILES:
        fetch(MNIST_BASE + name, os.path.join(root, "data/mnist", name))
    fetch(DSPRITES_URL, os.path.join(root, os.path.basename(DSPRITES_URL)))
    print("CelebA requires manual download (license agreement): "
          "https://mmlab.ie.cuhk.edu.hk/projects/CelebA.html")


if __name__ == "__main__":
    main()
