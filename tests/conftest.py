"""Test configuration: run everything on CPU with 8 virtual devices.

Sharding/multi-chip logic is validated on a virtual CPU mesh the same way
the reference fakes hardware with mocks (SURVEY.md §4).  The axon TPU
tunnel is far too slow for op-by-op test traffic.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path(os.environ.get("SDRM_REFERENCE_DIR", "/root/reference"))
FIXTURES_DIR = pathlib.Path(__file__).resolve().parent / "fixtures"


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    """The upstream C checkout — only for tests that cross-validate the
    VENDORED fixtures/tables against the original sources; everything
    else runs from tests/fixtures and needs no checkout."""
    if not REFERENCE_DIR.exists():
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES_DIR


@pytest.fixture(scope="session")
def resources_dir() -> pathlib.Path:
    """Golden fixture directory: the vendored copy (tests/fixtures),
    byte-identical to the reference's test/resources (asserted by
    test_vendored_fixtures_match_reference when the checkout exists)."""
    return FIXTURES_DIR
