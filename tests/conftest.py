"""Test harness config: force an 8-virtual-device CPU backend.

Multi-chip hardware is not available in CI (one real TPU chip behind a
tunnel); per SURVEY.md §4, multi-device logic is validated on a virtual CPU
mesh. Must run before jax initializes, hence env mutation at import time.
"""

import os

# The shell env pins JAX_PLATFORMS to the tunneled TPU ('axon') and the
# plugin overrides the env var, so force CPU through jax.config (which wins).
# Set GTOS_TEST_TPU=1 to run the suite against the real chip instead.
if os.environ.get("GTOS_TEST_TPU") == "1":
    # parity tests compare f32 math: TPU's default matmul precision is
    # reduced (bf16 passes), which breaks 1e-4-level tolerances
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
else:
    os.environ["JAX_PLATFORMS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")
