import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
# are exercised without TPU hardware (the driver separately dry-runs the
# multichip path; bench.py runs on the real chip).
#
# NOTE: the environment pre-sets JAX_PLATFORMS=axon (a remote-TPU tunnel
# with millisecond per-op latency) and a sitecustomize rewrites the env
# var, so the platform must be forced through jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
