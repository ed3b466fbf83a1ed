"""The README "Library API" examples stay executable.

``examples/custom_loop.py`` is the runnable form of the README's two
library-usage snippets (manual jitted-step loop + the ``run_epochs``
chained engine on the same un-jitted body); this smoke keeps the
documented API honest.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # two sprites GAN-step compiles (~2-4 min CPU)
def test_custom_loop_example(tmp_path):
    extra = os.environ.get("PYTHONPATH", "")
    env = dict(
        os.environ,
        EADGAN_PLATFORM="cpu",
        PYTHONPATH=os.pathsep.join(filter(None, [REPO, extra])),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "custom_loop.py"),
         "--steps", "4", "--chain", "2"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok: both engines ran 4 steps" in proc.stdout
    # both engines actually emitted per-step lines
    assert "[loop step 3]" in proc.stdout
    assert "[engine step 3]" in proc.stdout
