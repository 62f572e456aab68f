"""Test configuration: CPU backend with 8 virtual devices for sharding tests.

Must run before any jax import (hence env vars at module import time).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # 1-vCPU host: parallel LLVM codegen buys nothing and one XLA-CPU
    # compile SEGFAULT was observed under concurrent pytest processes
    # (NEXTSTEPS round 4 weak #6; faulthandler dump round 5). Serializing
    # codegen removes the compile-time thread storm — mitigation + tracking,
    # not a proven root cause (the crash never reproduced under a
    # 3x-concurrent targeted load, with or without this flag).
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags
# torch is imported by parity tests in the same process; cap its thread
# pools too (same 1-core thread-storm hygiene)
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

# A pytest plugin may have imported jax before this conftest ran, with the
# session's JAX_PLATFORMS (possibly a TPU) already captured. The backend only
# initializes lazily, so re-point it at CPU explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def add_reference_path():
    """Make the reference repo importable (for behavioral parity tests only)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
