"""Profile align/bam/genotype/consensus host stages on the sars_20000 demo."""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

from panmap_tpu.io import fastq
from panmap_tpu.io.panman import load_panman
from panmap_tpu.io.index_io import load_index

PANMAN = "/root/reference/examples/data/panmans/sars_20000_twilight_dipper.panman"
R1 = "/root/reference/examples/data/reads/isolate_R1.fastq.gz"
R2 = "/root/reference/examples/data/reads/isolate_R2.fastq.gz"
BEST = "node_7618"


def prof(label, fn):
    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    out = fn()
    pr.disable()
    print(f"=== {label}: {time.time()-t0:.2f}s ===", flush=True)
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print("\n".join(s.getvalue().splitlines()[4:40]), flush=True)
    return out


t0 = time.time()
tree = load_panman(PANMAN)
print(f"tree load {time.time()-t0:.1f}s")
idx = load_index("/root/repo/.cache/sars20000.ptidx.npz")
ref = tree.get_string(BEST)
names, seqs, quals = fastq.read_paired_for_alignment(R1, R2)

from panmap_tpu.align.batch import BatchAligner

aligner = prof("aligner-init", lambda: BatchAligner(ref))
pairs = prof("align", lambda: aligner.align_pairs_batch(seqs, True))

# emulate run_alignment record building + BAM write
from panmap_tpu import pipeline as P


class Cfg:
    output = "/tmp/out/prof"
    reads1 = R1
    reads2 = R2
    aligner = "minimap2"
    log = staticmethod(lambda *a: None)
    baq = False
    no_mutation_spectrum = False
    mutation_matrix = ""
    min_depth = 1
    min_qual = 30.0
    min_read_support = 2
    device_pileup = "off"


import types

cfg = Cfg()


def run_align_records():
    # replicate pipeline record-building from the pairs we already have
    import panmap_tpu.pipeline as pl
    # call the real run_alignment for a faithful profile (re-aligns, so time
    # only the record building below instead)
    return None


# profile record building + write via the real run_alignment (includes align)
ref2, placed = prof("run_alignment(total)", lambda: P.run_alignment(cfg, tree, BEST))
final = prof("genotype", lambda: P.run_genotyping(cfg, idx, ref2, BEST, placed))
prof("consensus", lambda: P.run_consensus(cfg, ref2, BEST, final))
