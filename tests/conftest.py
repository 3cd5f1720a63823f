"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware.

jax may already be pre-imported by the environment (an 'axon' TPU tunnel
module), so setting env vars alone is not enough — the platform is also
forced through jax.config before any backend initializes."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from km_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()  # CPU test compiles persist across pytest runs too

from km_tpu.refdata import DATA_DIR as REFDATA  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Skip fixture-dependent tests when the reference data tree is absent
    (e.g. a hosted CI runner) instead of erroring on FileNotFoundError."""
    if os.path.isdir(REFDATA):
        return
    skip = pytest.mark.skip(reason=f"reference fixtures not found at "
                            f"{REFDATA} (set KM_TPU_REFDATA)")
    needs_refdata: dict[str, bool] = {}
    for item in items:
        path = str(getattr(item, "fspath", ""))
        if path not in needs_refdata:
            try:
                src = open(path).read() if path.endswith(".py") else ""
            except OSError:
                src = ""
            needs_refdata[path] = "REFDATA" in src
        if needs_refdata[path]:
            item.add_marker(skip)
