"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before anything imports jax, hence top-of-conftest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize may have imported jax already (with JAX_PLATFORMS=axon baked
# into the config), so force the platform through the config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeat suite runs (and the many tests that
# recompile identical tiny-config programs) skip XLA compilation, which
# dominates this suite's wall clock.  Harmless on first run; gitignored.
try:
    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


from toucan_tpu.compat.reference_import import (  # noqa: E402,F401
    REFERENCE_ROOT as _REF_ROOT,
    import_reference_module,
    reference_available,
)
