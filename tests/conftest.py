"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU chip), so tests
must *force* cpu for hermeticity and for the 8-virtual-device sharding tests
(SURVEY.md section 4: the reference has no unit tests; this suite is the new
framework's per-kernel strategy). Set LHT_TEST_TPU=1 to run the suite against
the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if not os.environ.get("LHT_TEST_TPU"):
    # The axon sitecustomize registers the tunneled TPU backend at interpreter
    # startup and pins jax_platforms=axon; the env var alone cannot override
    # it, so counter-update the config before any backend initializes.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
