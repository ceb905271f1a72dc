"""Pseudochain rebuild-vs-incremental deviation study (VERDICT r4 weak #5).

tools/fuzz_pseudochain.py models BOTH semantics — this repo's rebuild
(initializeReadMinichains equivalent) and the reference's incremental patch
pipeline (mgsr.cpp:4616-5478) — and diffs them under adversarial edit
scripts.  This test pins the study's qualitative findings so a regression in
either model is caught:

  * the two semantics DO diverge (stale merged/unsplit chains in the
    incremental model), so a zero-mismatch run means the fuzzer broke;
  * single-step score divergence stays rare (< 2% of read-node steps);
  * when scores diverge, the incremental side is biased HIGH (stale chains
    merge across broken adjacency; the rebuild reflects true adjacency).
"""
import subprocess
import sys
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fuzz_pseudochain_study():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_pseudochain.py"),
         "150", "3"],
        capture_output=True, text=True, timeout=300, cwd=REPO)
    assert r.returncode == 0, r.stderr
    out = r.stdout
    m = re.search(r"one-step chain mismatches: (\d+) \(([\d.]+)%\).*"
                  r"one-step score mismatches: (\d+) \(([\d.]+)%\)", out)
    assert m, out
    chain_n, chain_pct, score_n, score_pct = (int(m.group(1)),
                                              float(m.group(2)),
                                              int(m.group(3)),
                                              float(m.group(4)))
    assert chain_n > 0, "fuzzer found no divergence — adversarial cases broke"
    assert score_pct < 2.0, f"one-step score divergence {score_pct}% >= 2%"
    mb = re.search(r"mean signed d-score over mismatches = (-?[\d.]+)", out)
    assert mb and float(mb.group(1)) > 0, (
        "incremental side should score HIGHER than rebuild on divergence", out)
