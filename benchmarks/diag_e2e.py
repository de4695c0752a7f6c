"""Diagnose the e2e regression: stage breakdown with Pallas on vs off."""
import os, sys, time, tempfile

sys.path.insert(0, "/root/repo")
from topsicle_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from benchmarks.e2e_cli import make_fastq


def run(use_pallas, fq, n_reads):
    from topsicle_tpu.config import TopsicleConfig
    from topsicle_tpu.io.writer import RunLog
    from topsicle_tpu.pipeline import JaxEngine

    out = tempfile.mkdtemp()
    cfg = TopsicleConfig(input_dir=fq, output_dir=out, pattern="CCCTAAA",
                         slide=6, use_pallas=use_pallas)
    log = RunLog(out, echo=False)
    t0 = time.time()
    eng = JaxEngine(cfg, log=log)
    results = eng.run()
    dt = time.time() - t0
    with open(os.path.join(out, "topsicle_run.log")) as fh:
        for line in fh:
            if "stage" in line or "reads/s" in line or "summary" in line.lower():
                print("  LOG:", line.rstrip(), file=sys.stderr)
    print(f"[diag] pallas={use_pallas}: {n_reads} reads in {dt:.1f}s = "
          f"{n_reads/dt:.0f} reads/s ({len(results)} rows)", file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    tmp = tempfile.mkdtemp()
    fq = os.path.join(tmp, "synthetic.fastq.gz")
    make_fastq(fq, n)
    for up in (sys.argv[2:] or ["false", "true"]):
        run(up == "true", fq, n)


if __name__ == "__main__":
    main()
