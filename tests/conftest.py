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

import hashlib  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _cpu_feature_tag() -> str:
    """Fingerprint the host CPU's feature flags for the cache key.

    XLA's persistent cache does NOT reject CPU AOT executables compiled on
    a host with a different feature set — it loads them with an error log
    only ("Target machine feature +prefer-no-scatter is not supported...")
    and the mis-targeted code produced subtly wrong numerics here: a
    cross-host stale cache made test_full_model_d6_split_parity fail on
    0.4% of pixels until the cache was cleared (round 3, measured). Keying
    the cache dir by the cpuinfo flags line makes a host change start a
    fresh cache instead.
    """
    try:
        with open("/proc/cpuinfo") as fh:
            line = next(ln for ln in fh if ln.startswith("flags"))
        return hashlib.md5(line.encode()).hexdigest()[:10]
    except Exception:
        return "generic"


try:  # persistent compile cache: repeat suite runs skip CPU XLA compiles
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/m4depth_jax_cache_cpu_{_cpu_feature_tag()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
