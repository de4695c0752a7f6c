"""Drive BASELINE.json configs 3 and 4 end-to-end on the chip.

Config 3 — "Human ONT reads, pattern CCCTAA, multi-k telophrase sweep
{4,5,6}": k=5/6 rotations of CCCTAA contain bordered k-mers (e.g.
CTAAC), so their tables are PERIODIC and route to the exact
phase/chunked scan paths — the production fallback that the demo and
the bench headline (aperiodic k=5 CCCTAAA) never exercise — while k=4
stays aperiodic on the scan-free sum path; one run covers both device
path families, the per-phrase model cache, and multi-k aggregation
(reference multi-k loop: main.py:206).

Config 4 — "PacBio HiFi plant genome, maxlengthtelo=20000,
rawcountpattern per-window output": long accurate reads + the per-read
extras path (allsteps.py:359-464) through the round-4 shared-pack
pipeline.

Each config: synthesize a cohort, run the JaxEngine (real chip under
axon), run the OracleEngine on the same input, assert byte-identical
telolengths_all.csv (and rawcount CSVs for config 4), and report
wall/stage rates.  Results recorded in CONFIGS_r04.json / BASELINE.md.

Usage: python benchmarks/configs_drive.py [config3|config4|all]
         [--reads N] [--out results.json]
"""

import argparse
import glob
import json
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from topsicle_tpu.config import TopsicleConfig  # noqa: E402
from topsicle_tpu.io.writer import RunLog  # noqa: E402


def _comp(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))


def make_cohort(dirname, n_files, reads_per_file, pattern, *, mean_len,
                seed, gz=True):
    """Telomere-bearing synthetic long reads: ~60% forward-telomere,
    ~20% reverse-end telomere (reversed-complement repeat at the far
    end), ~20% non-telomeric; telomere tract 800-6000 bp with 4% noise;
    lengths ~N(mean_len, mean_len/4) clipped to >9100."""
    import gzip

    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    os.makedirs(dirname, exist_ok=True)
    total_bp = 0
    for f in range(n_files):
        path = os.path.join(dirname, f"sample{f}.fastq" + (".gz" if gz else ""))
        op = gzip.open(path, "wt") if gz else open(path, "w")
        with op as fh:
            for i in range(reads_per_file):
                L = int(np.clip(rng.normal(mean_len, mean_len / 4), 9100, 60000))
                seq = rng.choice(bases, L)
                kind = rng.random()
                if kind < 0.8:
                    tl = int(rng.integers(800, 6000))
                    tract = (pattern * (tl // len(pattern) + 2))[:tl]
                    tract = np.array(list(tract))
                    noise = rng.random(tl) < 0.04
                    tract[noise] = rng.choice(bases, int(noise.sum()))
                    if kind < 0.6:
                        seq[:tl] = tract              # forward telomere
                    else:
                        # reverse tail: the complement strand's repeat
                        # sits reversed at the read's far end
                        rc = np.array(list(_comp("".join(tract))))[::-1]
                        seq[L - tl:] = rc
                s = "".join(seq)
                total_bp += L
                fh.write(f"@r{f}_{i}\n{s}\n+\n{'I' * L}\n")
    return total_bp


def _read_log_stages(outdir):
    txt = open(os.path.join(outdir, "topsicle_run.log")).read()
    m = re.findall(r"stages: (.*)", txt)
    return m


def run_engine(engine, indir, outdir, **cfg_kw):
    cfg = TopsicleConfig(input_dir=indir, output_dir=outdir, engine=engine,
                         **cfg_kw)
    log = RunLog(outdir, echo=False)
    t0 = time.time()
    from topsicle_tpu.pipeline import make_engine

    results = make_engine(cfg, log=log).run()
    return time.time() - t0, len(results)


def diff_outputs(a_dir, b_dir, patterns=("telolengths_all.csv",)):
    for pat in patterns:
        fa = sorted(glob.glob(os.path.join(a_dir, pat)))
        fb = sorted(glob.glob(os.path.join(b_dir, pat)))
        if [os.path.basename(x) for x in fa] != [os.path.basename(x) for x in fb]:
            return f"file sets differ for {pat}: {len(fa)} vs {len(fb)}"
        for x, y in zip(fa, fb):
            if open(x, "rb").read() != open(y, "rb").read():
                return f"bytes differ: {os.path.basename(x)}"
    return None


def drive_config3(n_reads, record):
    tmp = tempfile.mkdtemp(prefix="cfg3_")
    indir = os.path.join(tmp, "in")
    total_bp = make_cohort(indir, 3, n_reads // 3, "CCCTAA",
                           mean_len=18000, seed=33)
    kw = dict(pattern="CCCTAA", telophrase=[4, 5, 6], slide=None)
    jt, jrows = run_engine("jax", indir, os.path.join(tmp, "j"), **kw)
    ot, orows = run_engine("oracle", indir, os.path.join(tmp, "o"), **kw)
    mismatch = diff_outputs(os.path.join(tmp, "j"), os.path.join(tmp, "o"))
    from topsicle_tpu.kmers import all_aperiodic, telophrase_kmers

    record["config3"] = {
        "pattern": "CCCTAA", "telophrase": [4, 5, 6],
        "reads": n_reads, "total_mbp": round(total_bp / 1e6, 1),
        "rows": jrows,
        "paths": {k: ("sum(aperiodic)" if all_aperiodic(
            telophrase_kmers("CCCTAA", k)) else "phase/chunked(periodic)")
            for k in (4, 5, 6)},
        "jax_wall_s": round(jt, 1), "oracle_wall_s": round(ot, 1),
        "jax_reads_per_s": round(3 * n_reads / jt, 1),  # 3 k-passes
        "speedup_vs_oracle": round(ot / jt, 1),
        "csv_byte_identical": mismatch is None,
        "mismatch": mismatch,
        "stages": _read_log_stages(os.path.join(tmp, "j")),
    }
    return mismatch is None


def drive_config4(n_reads, record):
    tmp = tempfile.mkdtemp(prefix="cfg4_")
    indir = os.path.join(tmp, "in")
    # PacBio HiFi: long accurate reads, plant telomere CCCTAAA
    total_bp = make_cohort(indir, 1, n_reads, "CCCTAAA",
                           mean_len=16000, seed=44)
    kw = dict(pattern="CCCTAAA", slide=6, maxlengthtelo=20000)
    # plain run first (stage-time denominator for the extras overhead)
    pt, _ = run_engine("jax", indir, os.path.join(tmp, "p"), **kw)
    jt, jrows = run_engine("jax", indir, os.path.join(tmp, "j"),
                           rawcountpattern=True, **kw)
    ot, orows = run_engine("oracle", indir, os.path.join(tmp, "o"),
                           rawcountpattern=True, **kw)
    mismatch = diff_outputs(
        os.path.join(tmp, "j"), os.path.join(tmp, "o"),
        patterns=("telolengths_all.csv", "rawcount_*.csv"))
    n_raw = len(glob.glob(os.path.join(tmp, "j", "rawcount_*.csv")))
    record["config4"] = {
        "pattern": "CCCTAAA", "maxlengthtelo": 20000,
        "rawcountpattern": True, "reads": n_reads,
        "total_mbp": round(total_bp / 1e6, 1), "rows": jrows,
        "rawcount_csvs": n_raw,
        "jax_wall_s": round(jt, 1),
        "jax_wall_plain_s": round(pt, 1),
        "extras_overhead_x": round(jt / pt, 2),
        "oracle_wall_s": round(ot, 1),
        "speedup_vs_oracle": round(ot / jt, 1),
        "outputs_byte_identical": mismatch is None,
        "mismatch": mismatch,
        "stages_rawcount": _read_log_stages(os.path.join(tmp, "j")),
        "stages_plain": _read_log_stages(os.path.join(tmp, "p")),
    }
    return mismatch is None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="all",
                    choices=["config3", "config4", "all"])
    ap.add_argument("--reads", type=int, default=240)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from topsicle_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    record = {}
    ok = True
    if args.which in ("config3", "all"):
        ok &= drive_config3(args.reads, record)
        print(json.dumps({"config3": record["config3"]}), flush=True)
    if args.which in ("config4", "all"):
        ok &= drive_config4(args.reads, record)
        print(json.dumps({"config4": record["config4"]}), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(record, fh, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
