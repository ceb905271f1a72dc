"""panmap-tpu: TPU-native pangenome placement, alignment, and genotyping.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of amkram/panmap
(reference mounted at /root/reference): syncmer/k-min-mer seeding, a
mutation-aware seed-delta index over the PanMAN tree, per-node placement
scoring, seed-chain-extend alignment, pileup genotyping with a tree-derived
substitution-spectrum prior, and the metagenomic (mgsr) read-scoring + EM
haplotype-abundance solver.
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compilation cache (first compile of the placement
    programs over the remote link costs minutes; cached re-runs cost ~0).
    Override dir with PANMAP_TPU_COMPILE_CACHE; set to empty to disable."""
    import os

    path = os.environ.get("PANMAP_TPU_COMPILE_CACHE")
    if path == "":
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
