"""The (2,2,2)-mesh dryrun must compile without SPMD involuntary-full-
rematerialization warnings (wasted HBM + ICI every step on a real pod).

Regression gate for the one-hot embedding path in forward_train: a gather's
backward scatter-add into the (tp, fsdp)-sharded tok_embeddings forces the
partitioner to replicate the cotangent (see models/gpt.py forward_train).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_compiles_without_involuntary_remat():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert "Involuntary full rematerialization" not in out, out[-3000:]
    assert "tp-decode=token-exact OK" in out
