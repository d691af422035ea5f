import os

# Tests always run on a virtual 8-device CPU mesh: deterministic, f64-capable,
# and exercises multi-chip sharding paths without TPU hardware.  Bench and
# production entry points pick up the real backend.
#
# The container's sitecustomize pre-imports jax and registers the TPU plugin,
# so setting JAX_PLATFORMS via os.environ alone is too late — update the
# already-imported config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
