"""dryrun_multichip coverage over mesh layouts.

The driver validates n=8 (4x2 data x model); these cases prove the other
layouts compile and execute: even-but-small (2 -> 1-D data), odd (5 -> 1-D
fallback, the `tp = 2 if n >= 4 and even` branch in __graft_entry__), and
non-power-of-two 2-D (6 -> 3x2).  Each runs in a subprocess because
dryrun_multichip rebuilds the CPU backend with its own device count, which
must not disturb this process's 8-device test mesh.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # smoke tier: -m 'not slow' (see pytest.ini)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("n", [2, 5, 6], ids=["n2_1d", "n5_1d_odd", "n6_3x2"])
def test_dryrun_multichip_layouts(n):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # dryrun sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "multichip", str(n)],
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert f"dryrun_multichip({n}): [1/3] BIG-C sharded train step OK" in \
        r.stdout, r.stdout
    assert f"dryrun_multichip({n}): [2/3] BIG-C sharded inference OK" in \
        r.stdout, r.stdout
    assert f"dryrun_multichip({n}): [3/3] grounding sharded train step OK" \
        in r.stdout, r.stdout
