"""Multi-host orchestration (simulated in-process): file-sharded runs
merge to a CSV byte-identical to the single-host run."""

import gzip
import os
import random

import pytest

from topsicle_tpu.config import TopsicleConfig
from topsicle_tpu.parallel import distributed as dist_mod
from topsicle_tpu.pipeline import JaxEngine


def _write_file(path, rng, n_reads, pattern="CCCTAAA"):
    with gzip.open(path, "wt") as fh:
        for i in range(n_reads):
            telo_len = rng.randrange(300, 3000)
            telo = (pattern * (telo_len // len(pattern) + 1))[:telo_len]
            rest = "".join(rng.choice("ACGT") for _ in range(11000))
            fh.write(f"@{path.split('/')[-1]}.r{i}\n{telo + rest}\n+\n{'I' * (len(telo) + 11000)}\n")


def test_my_files_round_robin():
    files = ["a", "b", "c", "d", "e"]
    assert dist_mod.my_files(files, 0, 2) == [(0, "a"), (2, "c"), (4, "e")]
    assert dist_mod.my_files(files, 1, 2) == [(1, "b"), (3, "d")]


def test_two_process_merge_equals_single(tmp_path):
    rng = random.Random(21)
    d = tmp_path / "in"
    d.mkdir()
    for name in ["f0.fastq.gz", "f1.fastq.gz", "f2.fastq.gz"]:
        _write_file(str(d / name), rng, 5)

    # single-host reference run
    single = tmp_path / "single"
    JaxEngine(TopsicleConfig(input_dir=str(d), output_dir=str(single),
                             pattern="CCCTAAA", slide=6, batch_size=8)).run()
    want = (single / "telolengths_all.csv").read_bytes()

    # simulated 2-process run: worker (pid 1) first, then merger (pid 0)
    multi = tmp_path / "multi"
    multi.mkdir()
    for pid in (1, 0):
        cfg = TopsicleConfig(
            input_dir=str(d), output_dir=str(multi), pattern="CCCTAAA",
            slide=6, batch_size=8, process_id=pid, process_count=2,
        )
        JaxEngine(cfg).run()

    got = (multi / "telolengths_all.csv").read_bytes()
    assert got == want
    # parts cleaned up after merge
    assert not (multi / ".parts").exists()
    # every subset file exists exactly once (written by its owner)
    subsets = sorted(p.name for p in multi.glob("*_trc_over_*.fastq"))
    assert subsets == sorted(p.name for p in single.glob("*_trc_over_*.fastq"))


def test_distributed_rejects_resume_and_read_check(tmp_path):
    cfg = TopsicleConfig(input_dir="x", output_dir=str(tmp_path), pattern="CCCTAAA",
                         process_id=0, process_count=2, resume=True)
    with pytest.raises(ValueError):
        JaxEngine(cfg).run()


def test_concurrent_processes_cli(tmp_path):
    """Two OS processes running the real CLI concurrently with explicit
    --processId/--processCount: process 0 must wait (file-based
    done-markers) for the worker before merging, and the merged CSV must
    equal a single-process run byte for byte."""
    import subprocess
    import sys as _sys

    rng = random.Random(41)
    d = tmp_path / "in"
    d.mkdir()
    for name in ["a.fastq.gz", "b.fastq.gz", "c.fastq.gz", "d.fastq.gz"]:
        _write_file(str(d / name), rng, 4)

    single = tmp_path / "single"
    JaxEngine(TopsicleConfig(input_dir=str(d), output_dir=str(single),
                             pattern="CCCTAAA", slide=6, batch_size=8)).run()
    want = (single / "telolengths_all.csv").read_bytes()

    multi = tmp_path / "multi"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from topsicle_tpu.cli import main\n"
        "import sys\n"
        "sys.exit(main(['--inputDir', {ind!r}, '--outputDir', {outd!r},\n"
        "  '--pattern', 'CCCTAAA', '--slide', '6', '--batchSize', '8',\n"
        "  '--processId', {pid!r}, '--processCount', '2']))\n"
    )
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c",
             script.format(ind=str(d), outd=str(multi), pid=str(pid))],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
    assert (multi / "telolengths_all.csv").read_bytes() == want
    assert not (multi / ".parts").exists()


def test_stale_parts_from_crashed_run_excluded(tmp_path):
    """Leftover done-markers and part files from a crashed earlier run
    (even one with a different process count) must neither satisfy the
    merge barrier early nor leak stale rows into the merged CSV."""
    rng = random.Random(51)
    d = tmp_path / "in"
    d.mkdir()
    for name in ["f0.fastq.gz", "f1.fastq.gz"]:
        _write_file(str(d / name), rng, 4)

    single = tmp_path / "single"
    JaxEngine(TopsicleConfig(input_dir=str(d), output_dir=str(single),
                             pattern="CCCTAAA", slide=6, batch_size=8)).run()
    want = (single / "telolengths_all.csv").read_bytes()

    multi = tmp_path / "multi"
    parts = multi / ".parts"
    parts.mkdir(parents=True)
    # stale state: a dead 4-process run's markers and a stale part with
    # a bogus row, plus a stray part for a file index beyond this run
    import json as _json
    for p in range(4):
        (parts / f"done.{p:04d}").write_text(_json.dumps(
            {"pid": p, "parts": [f"0005_{p:06d}.rows.csv"]}))
    (parts / "0005_000000.rows.csv").write_text("ghost,5,0.999,stale_read,123\r\n")
    (parts / "0005_000000.agg.json").write_text(
        _json.dumps({"phrase": 5, "trc": [0.999], "telo": [123.0]}))
    (parts / "0005_000099.rows.csv").write_text("ghost,5,0.888,stray,9\r\n")
    (parts / "0005_000099.agg.json").write_text(
        _json.dumps({"phrase": 5, "trc": [0.888], "telo": [9.0]}))

    for pid in (1, 0):
        JaxEngine(TopsicleConfig(
            input_dir=str(d), output_dir=str(multi), pattern="CCCTAAA",
            slide=6, batch_size=8, process_id=pid, process_count=2,
        )).run()
    got = (multi / "telolengths_all.csv").read_bytes()
    assert b"stale_read" not in got and b"stray" not in got
    assert got == want
    assert not parts.exists()
