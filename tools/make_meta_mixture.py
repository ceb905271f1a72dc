#!/usr/bin/env python
"""Generate SARS haplotype mixtures for meta benchmarking and the demo-2 gate.

Default mode reproduces the reference demo's *shape* (5 arbitrary haplotypes,
200k read pairs) for benchmarking.  ``--golden EXPECTED`` instead reads the
haplotype names and proportions from the reference's golden abundance file
(/root/reference/examples/expected/meta_abundance/example.mgsr.abundance.out —
all 6 are nodes of the bundled sars_20000 panman) and simulates the mixture at
exactly those proportions, so `--meta` can be gated on recovering the golden
haplotype set (tools/check_examples.sh demo-2 surrogate).

Writes <out>/{mix_R1.fastq,mix_R2.fastq,truth.tsv} and copies the panman
(meta index caches next to it on first --meta run).
"""
import argparse
import os
import random
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PANMAN_SRC = "/root/reference/examples/data/panmans/sars_20000_twilight_dipper.panman"
DEFAULT_HAPS = ["node_7618", "node_2151", "node_12000", "node_4000", "node_9000"]
DEFAULT_PROPS = [0.50, 0.20, 0.15, 0.10, 0.05]


def rc(s):
    return s[::-1].translate(str.maketrans("ACGTN", "TGCAN"))


def read_golden(path):
    """(names, props) from an .mgsr.abundance.out file (first name per line)."""
    names, props = [], []
    with open(path) as fh:
        for line in fh:
            cols = line.rstrip("\n").split("\t")
            if len(cols) != 2:
                continue
            names.append(cols[0].split(",")[0])
            props.append(float(cols[1]))
    if not names:
        raise SystemExit(f"no haplotypes parsed from {path}")
    return names, props


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--golden", metavar="EXPECTED",
                    help="take haplotypes+proportions from this golden abundance file")
    ap.add_argument("--out", default="/tmp/mix", help="output directory")
    ap.add_argument("--n-pairs", type=int, default=200_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--frag-len", type=int, default=300)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--panman", default=PANMAN_SRC)
    args = ap.parse_args()

    if args.golden:
        haps, props = read_golden(args.golden)
    else:
        haps, props = DEFAULT_HAPS, DEFAULT_PROPS

    os.makedirs(args.out, exist_ok=True)
    dst = os.path.join(args.out, os.path.basename(args.panman))
    if not os.path.exists(dst):
        shutil.copy(args.panman, dst)
        os.utime(dst, (0, 0))

    from panmap_tpu.io.panman import load_panman

    tree = load_panman(dst)
    rng = random.Random(args.seed)
    genomes = [tree.get_string(h) for h in haps]
    L, FRAG = args.read_len, args.frag_len
    qual = "I" * L
    with open(f"{args.out}/mix_R1.fastq", "w") as f1, \
            open(f"{args.out}/mix_R2.fastq", "w") as f2:
        for i in range(args.n_pairs):
            hi = rng.choices(range(len(haps)), weights=props)[0]
            g = genomes[hi]
            pos = rng.randrange(0, len(g) - FRAG)
            frag = g[pos:pos + FRAG]
            r1 = frag[:L]
            r2 = rc(frag[-L:])
            f1.write(f"@p{i}/1\n{r1}\n+\n{qual}\n")
            f2.write(f"@p{i}/2\n{r2}\n+\n{qual}\n")
    with open(f"{args.out}/truth.tsv", "w") as ft:
        for h, p in zip(haps, props):
            ft.write(f"{h}\t{p}\n")
    print(f"wrote {args.n_pairs} pairs from {len(haps)} haplotypes to {args.out}")


if __name__ == "__main__":
    main()
