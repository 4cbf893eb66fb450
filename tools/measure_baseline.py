"""Measure BASELINE.md row 0: the ACTUAL reference gencore binary
(native/htsshim/build/gencore_ref, compiled from /root/reference/src) run
single-core on the exact bench workload. Writes
bench_data/baseline_ref.json, which bench.py prefers over any assumption.

The metric matches bench.py's timed region (BAM decode -> consensus ->
BAM write): the reference's FASTA load time is measured separately via an
empty-BAM run and subtracted.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.path.join(REPO, "native", "htsshim", "build", "gencore_ref")
BENCH_DIR = os.path.join(REPO, "bench_data")


def main():
    import bench
    bam_path, fa_path = bench.make_workload()
    if not os.path.exists(REF_BIN):
        subprocess.run(["make", "-C", os.path.join(REPO, "native", "htsshim")],
                       check=True)

    from gencore_tpu.io import bam as bamio
    n_reads = bamio.BamReader(bam_path).read_all().n

    # empty-BAM run isolates FASTA load + startup
    from tests.datagen import SyntheticBam
    sys.path.insert(0, os.path.join(REPO, "tests"))
    empty_bam = os.path.join(BENCH_DIR, "empty.bam")
    if not os.path.exists(empty_bam):
        sb = SyntheticBam(seed=1, contig_len=1000, n_contigs=2)
        # header must match contigs of the real FASTA? No: FASTA load time
        # depends only on the FASTA; one dummy pair keeps gencore happy.
        sb.add_pair(0, 100, 200)
        sb.write_bam(empty_bam)

    def run(bam, out, flags=(), fa=None):
        t0 = time.perf_counter()
        p = subprocess.run(
            [REF_BIN, "-i", bam, "-r", fa or fa_path, "-o", out,
             "-j", os.path.join(BENCH_DIR, "ref_baseline.json"),
             "--html", os.path.join(BENCH_DIR, "ref_baseline.html")]
            + list(flags),
            capture_output=True, timeout=3600)
        dt = time.perf_counter() - t0
        if p.returncode != 0:
            print(p.stderr.decode()[-500:], file=sys.stderr)
            raise SystemExit(f"reference run failed rc={p.returncode}")
        return dt

    # best-of-N elapsed: host-load noise only ever slows a run down, so
    # the minimum is the honest single-core capability (and the
    # CONSERVATIVE choice for vs_baseline — it maximizes the baseline)
    empty_s = min(run(empty_bam, os.path.join(BENCH_DIR, "ref_empty_out.bam"))
                  for _ in range(2))
    runs = [run(bam_path, os.path.join(BENCH_DIR, "ref_baseline_out.bam"))
            for _ in range(5)]
    med = min(runs)
    consensus_s = max(med - empty_s, 1e-3)
    rps = n_reads / consensus_s

    # per-config reference baselines (BASELINE.md's five tracked configs)
    configs = {"defaults": round(rps, 1)}
    for name, _kw, flags, wl in bench.bench_configs():
        if name == "defaults":
            continue
        cfa = None
        if wl is None:
            cbam = bam_path
        else:
            cbam, cfa = bench.make_ultradeep_workload()
        flags = [bench.make_bed() if a == "__BED__" else a for a in flags]
        nr = n_reads if wl is None else bamio.BamReader(cbam).read_all().n
        ts = [run(cbam, os.path.join(BENCH_DIR, f"ref_{name}_out.bam"),
                  flags, fa=cfa) for _ in range(2)]
        cs = max(min(ts) - empty_s, 1e-3)
        configs[name] = round(nr / cs, 1)

    result = {
        "binary": "gencore_ref(0.17.2)+htsshim",
        "reads_per_sec": round(rps, 1),
        "n_reads": n_reads,
        "elapsed_s": round(consensus_s, 2),
        "total_runs_s": [round(r, 2) for r in runs],
        "fasta_load_s": round(empty_s, 2),
        "configs": configs,
        "host": "single-core, this machine",
    }
    with open(os.path.join(BENCH_DIR, "baseline_ref.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
