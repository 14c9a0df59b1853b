"""Test config: run on CPU with 8 virtual devices so sharding tests need no TPU.

The environment pre-registers an 'axon' TPU backend via sitecustomize and
sets JAX_PLATFORMS=axon, so a plain env-var default is not enough — we
force the platform through jax.config before any device is touched.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
