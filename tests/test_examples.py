"""Example-script smoke: guards the doc-facing surface from bitrot.
Only the fast pedagogical example runs in the default lane; the heavy
ones (MAP, sampling, MUSE) are exercised by the slow lane / scripts."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_example_field_basics_runs():
    env = dict(os.environ, JAX_PLATFORMS="", CMBL_EXAMPLE_DEVICE="cpu")
    r = subprocess.run([sys.executable, os.path.join(ROOT, "examples",
                                                     "04_field_basics.py")],
                       capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
