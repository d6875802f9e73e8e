"""Runtime platform selection shared by every CLI.

The axon sitecustomize force-selects the TPU plugin programmatically
(overriding JAX_PLATFORMS); GRD4D_PLATFORM=cpu is this framework's
escape hatch for running the CLIs without the device tunnel. Must be
applied after `import jax` but before any jax API touches a backend.
"""

import os


def apply_platform_override() -> None:
    value = os.environ.get("GRD4D_PLATFORM")
    if value:
        import jax

        jax.config.update("jax_platforms", value)
