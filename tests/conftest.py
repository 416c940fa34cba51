"""Test configuration: force an 8-device virtual CPU platform.

Multi-device correctness is tested the way the reference tests SyncBN with two
GPUs in one process (/root/reference/lib/nn/modules/tests/test_sync_batchnorm.py):
oracle-equivalence between the sharded and single-device computation — here with
8 virtual CPU devices so no TPU is required.

Note: this environment boots a TPU PJRT plugin from sitecustomize and forces
`jax_platforms="axon,cpu"` — plain env vars are overridden, so we must set the
jax config directly after import.
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
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
