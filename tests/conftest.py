"""Test configuration: force an 8-virtual-device CPU platform before any jax
use, so every test exercises the SNP-axis sharded code path on a mesh.

Note: this environment's sitecustomize registers an experimental TPU backend
at interpreter start and overrides JAX_PLATFORMS, so we must force CPU via
jax.config after import rather than via the environment variable.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# WGSA_TEST_PLATFORM=tpu runs the suite against the real chip (hardware
# smoke for the Pallas Mosaic path — see .claude/skills/verify); default is
# the 8-virtual-device CPU mesh.
if os.environ.get("WGSA_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

DATA_DIR = pathlib.Path("/root/reference/data")
GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"

BREEDING_BEAGLE = DATA_DIR / "amre.breeding.ind85.ds_2x.sites-filter.top_50_each.beagle.gz"
BREEDING_SUBSET_BEAGLE = (
    DATA_DIR
    / "amre.breeding.ind85.ds_2x.sites-filter.top_50_each_subset_80percent_sites.beagle.gz"
)
BREEDING_IDS = DATA_DIR / "amre.breeding.ind85.reference_k5.IDs.txt"
NONBREEDING_BEAGLE = DATA_DIR / "amre.nonbreeding.ind34.ds_2x.sites-filter.top_50_each.beagle.gz"
NONBREEDING_IDS = DATA_DIR / "amre.nonbreeding.ind34.site.IDs.txt"


@pytest.fixture(scope="session")
def breeding():
    from wgsassign_tpu.io.beagle import read_beagle

    return read_beagle(str(BREEDING_BEAGLE))


@pytest.fixture(scope="session")
def breeding_ids():
    from wgsassign_tpu.io.ids import read_ids

    return read_ids(str(BREEDING_IDS))


@pytest.fixture(scope="session")
def nonbreeding():
    from wgsassign_tpu.io.beagle import read_beagle

    return read_beagle(str(NONBREEDING_BEAGLE))


@pytest.fixture(scope="session")
def nonbreeding_ids():
    from wgsassign_tpu.io.ids import read_ids

    return read_ids(str(NONBREEDING_IDS))
