#!/usr/bin/env python
"""Generate the 5-haplotype SARS mixture used for meta benchmarking
(reproduces the reference demo's shape: sars20000_5hap, 200k read pairs).

Writes /tmp/mix/{mix_R1.fastq,mix_R2.fastq,truth.tsv} and copies the panman
(meta index caches next to it on first --meta run).
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PANMAN_SRC = "/root/reference/examples/data/panmans/sars_20000_twilight_dipper.panman"
OUT = "/tmp/mix"
HAPS = ["node_7618", "node_2151", "node_12000", "node_4000", "node_9000"]
PROPS = [0.50, 0.20, 0.15, 0.10, 0.05]
N_PAIRS = 200_000
L = 150
FRAG = 300


def rc(s):
    return s[::-1].translate(str.maketrans("ACGTN", "TGCAN"))


def main():
    os.makedirs(OUT, exist_ok=True)
    dst = os.path.join(OUT, os.path.basename(PANMAN_SRC))
    if not os.path.exists(dst):
        import shutil

        shutil.copy(PANMAN_SRC, dst)
        os.utime(dst, (0, 0))
    from panmap_tpu.io.panman import load_panman

    tree = load_panman(dst)
    rng = random.Random(42)
    genomes = [tree.get_string(h) for h in HAPS]
    qual = "I" * L
    with open(f"{OUT}/mix_R1.fastq", "w") as f1, \
            open(f"{OUT}/mix_R2.fastq", "w") as f2:
        for i in range(N_PAIRS):
            hi = rng.choices(range(len(HAPS)), weights=PROPS)[0]
            g = genomes[hi]
            pos = rng.randrange(0, len(g) - FRAG)
            frag = g[pos:pos + FRAG]
            r1 = frag[:L]
            r2 = rc(frag[-L:])
            f1.write(f"@p{i}/1\n{r1}\n+\n{qual}\n")
            f2.write(f"@p{i}/2\n{r2}\n+\n{qual}\n")
    with open(f"{OUT}/truth.tsv", "w") as ft:
        for h, p in zip(HAPS, PROPS):
            ft.write(f"{h}\t{p}\n")
    print(f"wrote {N_PAIRS} pairs to {OUT}")


if __name__ == "__main__":
    main()
