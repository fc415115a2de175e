"""Test env: force CPU jax with 8 virtual devices so multi-chip sharding
logic runs without TPU hardware (SURVEY.md §4). Must run before jax imports.
"""

import os

# RHJ_TPU_SMOKE=1 keeps the real TPU visible for the tpu_smoke tier
# (tests/test_tpu_smoke.py); everything else runs on the virtual CPU
# mesh regardless of hardware
_TPU_SMOKE = os.environ.get("RHJ_TPU_SMOKE") == "1"
if not _TPU_SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon site hook pins jax_platforms=axon regardless of the env var;
# override it before any backend initialization so tests really run on the
# 8-virtual-device CPU platform.
import jax  # noqa: E402

if not _TPU_SMOKE:
    jax.config.update("jax_platforms", "cpu")
# Share the persistent XLA compilation cache (set up by the package import):
# the engine compiles one program per (op, shape-bucket); the cache makes
# repeat test runs compile-free.

import numpy as np
import pytest

SMALL = "/root/reference/small"


@pytest.fixture(scope="session")
def small_catalog():
    from radixhashjoin_tpu.storage import load_relation
    paths = [f"{SMALL}/r{i}" for i in range(14)]
    return [load_relation(p) for p in paths]


@pytest.fixture(scope="session")
def small_batches():
    from radixhashjoin_tpu.workload import parse_work_stream
    with open(f"{SMALL}/small.work") as f:
        return parse_work_stream(f)


@pytest.fixture(scope="session")
def golden_lines():
    with open(f"{SMALL}/small.result") as f:
        return [l.rstrip("\n") for l in f]


def make_relation(rng, n, cols, max_val=1 << 18):
    """Synthetic relation in reference value range (SURVEY.md §2.16)."""
    from radixhashjoin_tpu.storage import Relation
    data = [rng.integers(0, max_val, size=n).astype(np.uint64)
            for _ in range(cols)]
    return Relation(data)


def pytest_addoption(parser):
    parser.addoption("--run-tpu-smoke", action="store_true", default=False,
                     help="run the TPU-gated huge-path smoke tier "
                          "(tests/test_tpu_smoke.py) — real TPU only")
