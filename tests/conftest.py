"""Test configuration: run JAX on a simulated 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via the standard
JAX fake-backend pattern (xla_force_host_platform_device_count).  Must run
before jax is imported anywhere.
"""

import os

# The session environment pins JAX_PLATFORMS to the real TPU tunnel; tests
# run on the CPU fake backend unless explicitly opted in with AICG_TEST_TPU=1.
if os.environ.get("AICG_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags

from aicovergen_tpu.utils.platform import raise_cpu_collective_timeouts  # noqa: E402

raise_cpu_collective_timeouts()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

if os.environ.get("AICG_TEST_TPU", "0") != "1":
    # sitecustomize imports jax before conftest runs, so the env var alone is
    # too late — update the live config as well.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# persistent compile cache (partitioned per CPU fingerprint, see
# utils/platform.py): the slow tier's GAN train-step compiles are minutes —
# pay them once per host, not once per run
from aicovergen_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def fixture_dir():
    return FIXTURE_DIR


def load_fixture(name):
    path = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not generated (run scripts/make_fixtures.py)")
    return np.load(path)
