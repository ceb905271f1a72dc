"""panmap-tpu: TPU-native pangenome placement, alignment, and genotyping.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of amkram/panmap
(reference mounted at /root/reference): syncmer/k-min-mer seeding, a
mutation-aware seed-delta index over the PanMAN tree, per-node placement
scoring, seed-chain-extend alignment, pileup genotyping with a tree-derived
substitution-spectrum prior, and the metagenomic (mgsr) read-scoring + EM
haplotype-abundance solver.
"""

__version__ = "0.1.0"


def _tune_host_memory():
    """Disable numpy's MADV_HUGEPAGE on large buffers (must run before numpy
    is first imported).  On VMs with synchronous THP compaction, every fresh
    huge-page fault costs ~100ms+, which made large one-shot numpy
    allocations (np.empty + first write) run at ~10 MB/s instead of ~2 GB/s —
    a 10-30x slowdown of every host-side array stage.  Override by setting
    NUMPY_MADVISE_HUGEPAGE yourself."""
    import os
    import sys

    if "numpy" not in sys.modules:
        os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    elif os.environ.get("NUMPY_MADVISE_HUGEPAGE") is None:
        # numpy already imported (e.g. by sitecustomize) — runtime switch
        try:
            try:
                from numpy._core import multiarray as _ma
            except ImportError:  # numpy < 2
                from numpy.core import multiarray as _ma
            _ma._set_madvise_hugepage(False)
        except Exception:
            pass
    # keep large freed buffers on the heap instead of returning them to the
    # OS (re-faulting them back in is the expensive part)
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_host_memory()


def _enable_compile_cache():
    """Persistent XLA compilation cache (first compile of the placement
    programs over the remote link costs minutes; cached re-runs cost ~0).
    Override dir with PANMAP_TPU_COMPILE_CACHE; set to empty to disable."""
    import os

    path = os.environ.get("PANMAP_TPU_COMPILE_CACHE")
    if path == "":
        return
    # CPU runs (tests, the driver's virtual-mesh dryruns) compile fast and
    # XLA:CPU AOT cache entries are machine-feature-pinned — reusing them on
    # a different host risks SIGILL, so only cache when an accelerator
    # backend is actually in play (explicit platform or a device hint)
    if path is None:
        platforms = os.environ.get("JAX_PLATFORMS", "").strip().lower()
        accel_hint = (
            (platforms and platforms != "cpu")
            or os.environ.get("PALLAS_AXON_POOL_IPS")
            or os.environ.get("TPU_NAME")
            or os.path.exists("/dev/accel0"))
        if not accel_hint:
            return
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache", "panmap_tpu",
                            "jaxcache")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()
