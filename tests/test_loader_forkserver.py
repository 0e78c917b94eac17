"""Process-worker loader must survive a launcher whose __main__ initializes
jax at module scope.

The stdlib forkserver preloads ['__main__'] by default; a script that builds
an XLA client at import time would replay that init inside the forkserver,
and every worker would then fork from a thread/lock-poisoned image -- a racy
wedge observed live (parent parked in Pool startup with 0..N workers).
datasets/loader.py and utils/ap_calculator.py empty the preload list; this
test drives the loader from exactly such a script and requires completion.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
jax.devices()  # force the XLA client (threads) at MODULE level of __main__
import numpy as np

class DS:
    def __len__(self): return 16
    def __getitem__(self, i): return {"x": np.full((4,), i, np.float32)}

if __name__ == "__main__":
    from coda_neurips2023_tpu.datasets.loader import make_loader
    loader = make_loader(DS(), 8, shuffle=False, drop_last=True,
                         num_workers=2, use_processes=True)
    print("SUM", sum(float(b["x"].sum()) for b in loader))
"""


def test_process_loader_with_jax_initializing_main(tmp_path):
    script = tmp_path / "launcher.py"
    script.write_text(SCRIPT % {"repo": REPO})
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single-device CPU client is enough
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=240, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SUM 480.0" in out.stdout, out.stdout
