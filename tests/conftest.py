import os
import sys

# Force JAX onto a virtual 8-device CPU mesh for sharding tests; real TPU runs
# go through bench.py / the CLI which do not import this conftest.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # see panmap_tpu.__init__
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
