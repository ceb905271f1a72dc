"""panmap-tpu: TPU-native pangenome placement, alignment, and genotyping.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of amkram/panmap
(reference mounted at /root/reference): syncmer/k-min-mer seeding, a
mutation-aware seed-delta index over the PanMAN tree, per-node placement
scoring, seed-chain-extend alignment, pileup genotyping with a tree-derived
substitution-spectrum prior, and the metagenomic (mgsr) read-scoring + EM
haplotype-abundance solver.
"""

__version__ = "0.1.0"
