"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh so multi-chip sharding is
exercised without TPU hardware (the driver separately dry-runs the real
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent jit cache: without it a cold /tmp (fresh session) recompiles
# every XLA graph and interpret-mode kernel harness, blowing the suite from
# ~4 min to >30 min. Same cache the bench/tools use.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob
# must land before first backend use (see CLAUDE.md). Tests run on the
# virtual CPU mesh so they neither require nor contend for TPU hardware.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/data")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier: dense mutation batteries, huge-stream "
             "constant-memory process tests, exhaustive sweeps")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: slow-tier test (runs only with --runslow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def snappy_dir() -> pathlib.Path:
    return REFERENCE_DATA / "snappy"


@pytest.fixture(scope="session")
def mutate_dir() -> pathlib.Path:
    return REFERENCE_DATA / "mutate"


@pytest.fixture(scope="session")
def special_dir() -> pathlib.Path:
    return REFERENCE_DATA / "special"


@pytest.fixture(scope="session")
def synth_dir() -> pathlib.Path:
    return REFERENCE_DATA / "synth"
