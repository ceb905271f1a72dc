import os
import sys

# The fast suite runs on a virtual 8-device CPU mesh; real TPU runs go
# through bench.py / the CLI / tools/real_tpu_check.py which do not import
# this conftest.
#
# On axon-tunnel machines a sitecustomize hook registers the remote TPU
# plugin at interpreter startup and pins jax's platform config to "axon",
# so neither JAX_PLATFORMS=cpu in the env nor popping the hook's env vars
# helps once the interpreter is up — and when the tunnel is slow or down,
# the first jax.devices() hangs the whole test run.  Overriding the CONFIG
# before any backend initializes keeps the suite CPU-only and
# tunnel-independent.  Set PANMAP_TPU_TESTS_REAL=1 to skip the override and
# run against whatever backend the environment provides (e.g. the real
# chip).
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # see panmap_tpu.__init__
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
if not os.environ.get("PANMAP_TPU_TESTS_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
