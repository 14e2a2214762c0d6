import os

# Force a virtual 8-device CPU mesh for all tests: sharding code paths are
# exercised without real multi-chip hardware (bench runs separately on TPU).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin ignores JAX_PLATFORMS; the programmatic config wins
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test (subprocess "
        "cluster boots, big-grid regressions)")


@pytest.fixture(scope="session")
def hmf_validation_params():
    from pinocchio_tpu.config import read_parameter_file
    # shipped outputs were produced with
    # -DTWO_LPT -DTHREE_LPT -DELL_CLASSIC -DNORADIATION
    # (HMF_Validation/VALIDATION_log.txt compile line)
    return read_parameter_file(os.path.join(REFERENCE, "HMF_Validation",
                                            "parameter_file"),
                               norad=True, plc_enabled=False)


@pytest.fixture(scope="session")
def hmf_validation_cosmology(hmf_validation_params):
    from pinocchio_tpu.cosmology import Cosmology
    return Cosmology(hmf_validation_params)


@pytest.fixture(scope="session")
def fmax_result(hmf_validation_params, hmf_validation_cosmology):
    from pinocchio_tpu.fmax import run_fmax
    return run_fmax(hmf_validation_params, hmf_validation_cosmology,
                    verbose=False)


@pytest.fixture(scope="session")
def reference_cosmology_table():
    """Columns of HMF_Validation/pinocchio.test.cosmology.out (oracle)."""
    path = os.path.join(REFERENCE, "HMF_Validation",
                        "pinocchio.test.cosmology.out")
    return np.loadtxt(path)
