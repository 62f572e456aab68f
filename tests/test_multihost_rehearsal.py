"""The 2-process CPU-loopback training rehearsal as a suite test: spawns the
driver script (scripts/rehearse_multihost.py) in a subprocess tree and
asserts the PASS line (single-process vs 2-process loss equality)."""
import pytest
import os
import subprocess
import sys

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_loopback_matches_single():
    # bounded by the subprocess timeout below (pytest-timeout not installed)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the script pins platforms itself
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "rehearse_multihost.py")],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=850,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "PASS" in out.stdout, out.stdout[-2000:]
