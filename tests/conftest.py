"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This mirrors the SURVEY §4 rebuild test plan: multi-device code paths are
exercised without TPU hardware via ``xla_force_host_platform_device_count``.
Must be set before JAX initializes its backend, hence at conftest import time.
"""

import os

# Force CPU: the ambient environment (a sitecustomize on PYTHONPATH) pins
# JAX_PLATFORMS to the tunneled TPU ("axon"), which is single-client —
# concurrent test runs would deadlock on it. The env var alone is overridden
# at interpreter start, so also set jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()
