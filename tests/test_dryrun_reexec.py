"""The dryrun_multichip re-exec branch works.

The driver calls ``__graft_entry__.dryrun_multichip(n)`` on a machine
whose JAX backend may already be initialized with fewer than n devices
(one real TPU chip). That path re-execs a spoofed-CPU subprocess
(__graft_entry__.py:110-127); a regression there flips the driver's
multichip light red, so pin it here: initialize a 1-device backend
first, then ask for a 4-device dryrun.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import jax
assert len(jax.devices()) == 1, jax.devices()
import sys
sys.path.insert(0, {repo!r})
from __graft_entry__ import dryrun_multichip
dryrun_multichip(4)
print("REEXEC_BRANCH_OK")
"""


@pytest.mark.slow
def test_reexec_branch_with_initialized_small_backend():
    env = dict(os.environ)
    # 1-device CPU backend, initialized before dryrun_multichip runs
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # `import jax` in a fresh interpreter runs the axon plugin
    # registration (sitecustomize), which retry-loops forever when the
    # device tunnel is down — even under JAX_PLATFORMS=cpu. Probe it
    # with a bounded subprocess and skip rather than hang the suite.
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            env=env, capture_output=True, timeout=180,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("axon plugin registration hangs: device tunnel down")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "REEXEC_BRANCH_OK" in proc.stdout
    assert "one DP train step OK" in proc.stdout
