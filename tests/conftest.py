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


# ---- suite tiers -----------------------------------------------------
# The full suite is ~50 min on the 1-core CI host; iteration runs the
# smoke tier. Lanes (documented in CLAUDE.md):
#   -m smoke                  fast unit/behavior tests (~minutes)
#   -m golden                 torch-oracle golden suites
#   -m slow                   multi-minute e2e/CLI/train suites
# Marking is automatic by module: test_golden_* => golden; the measured
# multi-minute modules => slow; everything else => smoke.

_SLOW_MODULES = {
    # measured >60 s/module on the 1-core host (pytest --durations, r5:
    # tools 549s, train 461s, overfit 450s, parallel_cam 380s, serve
    # 292s, export 269s, models 245s, distill 180s, configs 120s,
    # variants 114s, lidar_seg 100s, convert 67s)
    "test_configs",
    "test_convert",
    "test_distill",
    "test_export",
    "test_lidar_seg",
    "test_models",
    "test_overfit",
    "test_parallel_cam",
    "test_serve",
    "test_tools",
    "test_train",
    "test_variants",
}


def pytest_configure(config):
    for name, desc in (
        ("smoke", "fast unit/behavior tests (default iteration lane)"),
        ("golden", "torch-oracle golden-activation suites"),
        ("slow", "multi-minute e2e/CLI/train suites"),
    ):
        config.addinivalue_line("markers", f"{name}: {desc}")


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod.startswith("test_golden"):
            item.add_marker(pytest.mark.golden)
        elif mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.smoke)
