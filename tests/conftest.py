"""Test configuration: run JAX on CPU with 8 virtual devices.

The sharding tests exercise pjit/Mesh logic without TPUs (SURVEY.md §4.7);
everything else is plain single-device numerics that behaves identically on
CPU and TPU up to float rounding.

Environment note: this image boots a sitecustomize hook that registers the
'axon' TPU PJRT plugin in every python process and pins
jax_platforms='axon,cpu'.  Concurrent processes contend for the single TPU
tunnel and deadlock, so tests force the CPU backend via jax.config (env vars
are too late — jax is already imported at interpreter boot).
"""

import os

# For any subprocesses spawned by tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
