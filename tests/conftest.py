"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding/pjit paths are exercised without TPU hardware (SURVEY §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores the env var, so force the platform through the
# config API as well (must run before any backend is initialized).
import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


# Two test lanes (VERDICT r3 #7): the default lane must stay fast enough to
# run on every iteration; everything marked `slow` (torch-parity suites,
# multi-epoch training, interpret-mode Pallas oracles) runs only with --slow.
def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False,
                     help="also run tests marked slow (the full CI lane)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow lane: re-run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
