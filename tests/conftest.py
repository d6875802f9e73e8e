"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

# force-set: the environment pre-sets JAX_PLATFORMS=axon (real TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin's sitecustomize sets jax_platforms programmatically,
# overriding the env var — force CPU again at the config level
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
