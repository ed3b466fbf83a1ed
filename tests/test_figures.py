"""Smoke tests for the sample-figure generators (artifact layout)."""

import os

import numpy as np

from eadgan_tpu.sample.figures import (
    celeba_inference_grids,
    celeba_training_grids,
    mnist_inference_grids,
    mnist_training_grids,
    pxy_grids,
    sprites_training_grids,
)


def _fake_g(shape):
    def apply(*inputs):
        n = inputs[0].shape[0]
        return np.zeros((n,) + shape, np.float32)

    return apply


def test_mnist_grids(tmp_path, rng):
    out = str(tmp_path)
    real = rng.uniform(-1, 1, (100, 32, 32, 1)).astype(np.float32)
    mnist_training_grids(_fake_g((32, 32, 1)), real, real, out, 0)
    for sub in ["static", "original", "scaled"] + [f"varying_c{i}" for i in range(1, 8)]:
        assert os.path.exists(os.path.join(out, sub, "0.png")), sub
    mnist_inference_grids(_fake_g((32, 32, 1)), out + "/inf")
    assert os.path.exists(os.path.join(out, "inf", "varying_c7", "0.png"))


def test_sprites_grids(tmp_path, rng):
    out = str(tmp_path)
    img = rng.uniform(0, 1, (100, 64, 64, 1)).astype(np.float32)
    sprites_training_grids(_fake_g((64, 64, 1)), img, img, out, 0, code_dim=4)
    for i in range(1, 8):
        assert os.path.exists(os.path.join(out, f"varying_c{i}", "0.png"))
    pxy_grids(img, img, out + "/pxy", 0)
    assert os.path.exists(os.path.join(out, "pxy", "align", "0.png"))


def test_celeba_grids(tmp_path, rng):
    out = str(tmp_path)
    real = rng.uniform(-1, 1, (100, 64, 64, 3)).astype(np.float32)
    celeba_training_grids(_fake_g((64, 64, 3)), real, real, out, 0)
    for i in range(1, 9):
        assert os.path.exists(os.path.join(out, f"varying_c{i}", "0.png"))
    celeba_inference_grids(_fake_g((64, 64, 3)), out + "/inf")
    assert os.path.exists(os.path.join(out, "inf", "varying_c8", "0.png"))


def test_plot_metrics_tool(tmp_path):
    """tools/plot_metrics.py renders curves from MetricLogger JSONL:
    multi-file overlay, restart dedup (latest record wins), smoothing,
    and the throughput panel all execute headless."""
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import plot_metrics

    a = tmp_path / "a.jsonl"
    with open(a, "w") as f:
        for s in range(60):
            f.write(json.dumps({"step": s, "t": s * 0.1, "d_loss": 1.0 / (s + 1), "g_loss": 0.5}) + "\n")
        # a restarted life replays step 59 with a different value: dedup keeps it
        f.write(json.dumps({"step": 59, "t": 6.0, "d_loss": 42.0, "g_loss": 0.5}) + "\n")
    b = tmp_path / "b.jsonl"
    with open(b, "w") as f:
        for s in range(40):
            f.write(json.dumps({"step": s, "t": s * 0.2, "d_loss": 0.9}) + "\n")

    rows = plot_metrics.load_jsonl(str(a))
    assert len(rows) == 60 and rows[-1]["d_loss"] == 42.0

    out = plot_metrics.main(
        [str(a), str(b), "--out", str(tmp_path / "p" / "curves.png"),
         "--smooth", "7", "--throughput"]
    )
    assert os.path.exists(out) and os.path.getsize(out) > 10_000

    # throughput never differences across a restart's clock reset: two
    # lives at 10 steps/s with t restarting near 0 must yield only ~10
    # (a boundary-spanning window would fabricate a huge rate)
    import numpy as np

    steps = np.arange(100)
    t = np.concatenate([steps[:50] * 0.1, (steps[50:] - 50) * 0.1])
    x, rate = plot_metrics.throughput(steps, t, window=20)
    assert len(rate) > 0 and np.allclose(rate, 10.0)
