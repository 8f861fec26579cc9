"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective paths are
validated on a forced 8-device CPU platform (the driver separately dry-runs
the multichip path via __graft_entry__.dryrun_multichip).

Note: this environment preimports jax at interpreter startup, so env vars set
here would be too late for config defaults — we use jax.config.update, which
works as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # persistent compile cache: repeat suite runs skip CPU XLA compiles
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/m4depth_jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
