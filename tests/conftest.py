"""Test config: run the suite on a virtual 8-device CPU mesh.

The image's sitecustomize registers the axon TPU backend and pins
JAX_PLATFORMS=axon before any of our code runs, so an env-var override is
too late — we force the CPU platform through jax.config after import
(before any backend is initialised) and request 8 virtual host devices so
multi-chip sharding tests (ppermute halo exchange, shard_map) run without
real chips — the same mechanism the driver's dryrun uses.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()}x {jax.devices()[0].platform}"
