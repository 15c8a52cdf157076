"""Test environment: force CPU JAX with 8 virtual devices.

Must run before any ``import jax`` so the XLA client is created with the
forced host platform; CI therefore needs no TPU. Multi-chip sharding tests
use the 8 virtual devices as a stand-in mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
