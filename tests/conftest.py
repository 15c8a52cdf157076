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

# If a site hook already imported jax before this conftest ran (this
# container's axon sitecustomize does), the env vars above are too late —
# force the CPU platform programmatically, and pin true-fp32 matmuls (on
# TPU fp32 matmuls default to bf16x3, which breaks parity tolerances).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache (works on the CPU backend since jaxlib 0.4+;
# probed on this box's jax 0.9.0): XLA compiles dominate the suite's wall
# time on a 1-core host, and most test programs repeat run-to-run. First
# run populates ~/.jax_test_cache; repeat runs (re-running a chunk, the
# next round's CI pass) skip every compile >1 s. Keyed by backend + config,
# so the forced-highest-precision CPU entries cannot collide with the TPU
# bench cache.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolate_global_jax_config():
    """Restore process-global JAX config mutated by the code under test.

    ``cli train`` switches the default PRNG impl to the TPU hardware RBG
    (utils/profiling.py ``enable_tpu_fast_rng``); running the CLI
    in-process must not leak that into later tests' noise streams.
    """
    prng = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != prng:
        jax.config.update("jax_default_prng_impl", prng)
