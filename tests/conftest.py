"""Test harness config: force a virtual 8-device CPU mesh before JAX import.

Multi-chip sharding is validated without TPU pods by running pjit/shard_map
over 8 virtual CPU devices (the driver separately dry-runs
__graft_entry__.dryrun_multichip the same way)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override (env may carry a TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys  # noqa: E402

import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))

# The axon TPU plugin's sitecustomize imports jax before this file runs,
# so the env override above can arrive after jax read its config — and a
# wedged tunnel then blocks the first jax.devices() call (even the "cpu"
# query initializes every registered backend).  The default suite is
# CPU-only by design (TPU coverage is RUN_TPU-gated), so enforce
# cpu-only through the live config unless the caller asked for the chip;
# then pin the default device so tests run f64-exact and fast.
import jax  # noqa: E402

if not os.environ.get("RUN_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from fixtures import ensure_fixtures  # noqa: E402


@pytest.fixture(scope="session")
def fixture_paths():
    return ensure_fixtures()


@pytest.fixture(scope="session")
def oracle_exe(tmp_path_factory):
    """Reference simulator compiled against stub iio/curl libs."""
    from ref_harness import harness
    if not harness.reference_available():
        pytest.skip("reference source not mounted")
    out = tmp_path_factory.mktemp("oracle")
    return harness.build_oracle(str(out))
