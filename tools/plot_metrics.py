#!/usr/bin/env python
"""Render training curves from MetricLogger JSONL logs.

    python tools/plot_metrics.py run.jsonl [more.jsonl ...] \
        [--out curves.png] [--metrics d_loss,g_loss] [--smooth 101] \
        [--throughput]

One subplot per metric, every input file overlaid as one series (so a
resumed/supervised run's lives, or two configurations, can be compared
on the same axes).  ``--throughput`` adds a steps/s panel derived from
the per-record wall-clock ``t`` field.  The reference's observability
is print lines and image grids only (SURVEY.md section 5 —
e.g. dSprites/rp.py:491-496); the trainers here emit ``--jsonl``
records this tool turns into curves.

Pure host-side tooling: no jax import, safe on any machine.
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")  # headless; never require a display
import matplotlib.pyplot as plt
import numpy as np


def load_jsonl(path):
    """Rows sorted by step; a restarted run's replayed steps are
    deduplicated with the LATEST record winning (the later life's
    value is the one that fed subsequent training)."""
    by_step = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            by_step[r["step"]] = r
    return [by_step[s] for s in sorted(by_step)]


def smooth(y, window: int):
    if window <= 1 or len(y) < 3:
        return y
    window = min(window | 1, len(y) | 1)  # odd, bounded by series length
    kernel = np.ones(window) / window
    pad = window // 2
    padded = np.concatenate([np.repeat(y[0], pad), y, np.repeat(y[-1], pad)])
    return np.convolve(padded, kernel, mode="valid")


def throughput(steps, t, window: int = 50):
    """steps/s over a trailing window of records; dips from event
    stalls show up, which is the point.  MetricLogger's ``t`` is
    relative to each LIFE's start (a supervised restart appends records
    whose clock resets to ~0), so any window spanning a life boundary
    would difference two unrelated clocks — boundaries are detected as
    t decreasing in step order and such windows are dropped rather than
    plotted as fabricated rates."""
    steps = np.asarray(steps, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    if len(steps) <= window:
        window = max(1, len(steps) - 1)
    if window < 1:
        return steps[:0], t[:0]
    lives = np.concatenate([[0], np.cumsum(np.diff(t) < 0)])
    ds = steps[window:] - steps[:-window]
    dt = t[window:] - t[:-window]
    ok = (dt > 0) & (lives[window:] == lives[:-window])
    return steps[window:][ok], (ds[ok] / dt[ok])


def main(argv=None) -> str:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("jsonl", nargs="+", help="MetricLogger JSONL file(s)")
    parser.add_argument("--out", default="curves.png", help="output image path")
    parser.add_argument(
        "--metrics", default="",
        help="comma-separated metric names (default: every numeric "
        "field except step/t, union over inputs)",
    )
    parser.add_argument(
        "--smooth", type=int, default=1,
        help="rolling-mean window in records (1 = raw; GAN losses are "
        "noisy — 101 reads well on long runs)",
    )
    parser.add_argument(
        "--throughput", action="store_true",
        help="add a steps/s panel computed from the wall-clock t field",
    )
    opt = parser.parse_args(argv)

    runs = {os.path.basename(p) or p: load_jsonl(p) for p in opt.jsonl}
    runs = {name: rows for name, rows in runs.items() if rows}
    if not runs:
        raise SystemExit("no records in any input file")

    if opt.metrics:
        names = [m.strip() for m in opt.metrics.split(",") if m.strip()]
    else:
        names = sorted(
            {
                k
                for rows in runs.values()
                for k in rows[0]
                if k not in ("step", "t") and isinstance(rows[0][k], (int, float))
            }
        )
    panels = [("metric", n) for n in names]
    if opt.throughput:
        panels.append(("throughput", "steps/s"))
    if not panels:
        raise SystemExit("nothing to plot (no metrics found; see --metrics)")

    fig, axes = plt.subplots(
        len(panels), 1, figsize=(9, 2.4 * len(panels)), sharex=True, squeeze=False
    )
    for ax, (kind, name) in zip(axes[:, 0], panels):
        for run_name, rows in runs.items():
            steps = np.array([r["step"] for r in rows])
            if kind == "metric":
                pts = [(s, r[name]) for s, r in zip(steps, rows) if name in r]
                if not pts:
                    continue
                x = np.array([p[0] for p in pts])
                y = smooth(np.array([p[1] for p in pts], dtype=np.float64), opt.smooth)
            else:
                t = np.array([r.get("t", np.nan) for r in rows])
                x, y = throughput(steps, t)
                if len(x) == 0:
                    continue
            label = run_name if len(runs) > 1 else None
            ax.plot(x, y, linewidth=0.9, label=label)
        ax.set_ylabel(name)
        ax.grid(True, alpha=0.3)
        if len(runs) > 1:
            ax.legend(fontsize=8)
    axes[-1, 0].set_xlabel("step")
    fig.tight_layout()
    out_dir = os.path.dirname(opt.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    fig.savefig(opt.out, dpi=120)
    plt.close(fig)
    print(f"wrote {opt.out} ({len(panels)} panels, {len(runs)} run(s))")
    return opt.out


if __name__ == "__main__":
    main()
