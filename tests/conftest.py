import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (see task brief / SURVEY.md section 7).
# Force (not setdefault): the harness exports JAX_PLATFORMS=axon, and
# every CLI subprocess spawned by e2e tests would otherwise initialize
# the TPU tunnel (slow and flaky under load).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some PJRT plugins (e.g. the axon TPU tunnel) register regardless of
# JAX_PLATFORMS; pin the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

EXAMPLE = "/root/reference/example"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (production-size DP cases "
             "whose quick monkeypatched variants run by default)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: production-size case with a quick default "
                   "variant; run with --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="needs --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def example_dir():
    return EXAMPLE
