"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware; the driver's
dryrun separately compiles the sharded step, and benchmarks run on real
chips.

The session environment pre-imports jax and points it at a tunneled TPU
(JAX_PLATFORMS=axon via sitecustomize), so an env-var default is not enough:
we must override the live jax config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
