"""Restartable runs: manifest-based resume, partial-unit recomputation,
and stage timers."""

import csv
import gzip
import random

import pytest

from topsicle_tpu.config import TopsicleConfig
from topsicle_tpu.pipeline import JaxEngine
from topsicle_tpu.utils import RunManifest, StageTimers


def _write_file(path, rng, n_reads, pattern="CCCTAAA"):
    with gzip.open(path, "wt") as fh:
        for i in range(n_reads):
            telo_len = rng.randrange(300, 3000)
            telo = (pattern * (telo_len // len(pattern) + 1))[:telo_len]
            rest = "".join(rng.choice("ACGT") for _ in range(12000))
            fh.write(f"@r{i}\n{telo + rest}\n+\n{'I' * (len(telo) + 12000)}\n")


def test_manifest_roundtrip(tmp_path):
    m = RunManifest(str(tmp_path))
    assert not m.is_done("/a/b.fastq", 5)
    m.mark_done("/a/b.fastq", 5, 17)
    m2 = RunManifest(str(tmp_path))
    assert m2.is_done("/a/b.fastq", 5)
    assert m2.rows_for("/a/b.fastq", 5) == 17
    m2.reset()
    assert not RunManifest(str(tmp_path)).is_done("/a/b.fastq", 5)


def test_resume_skips_completed_unit(tmp_path):
    rng = random.Random(5)
    d = tmp_path / "in"
    d.mkdir()
    _write_file(str(d / "a.fastq.gz"), rng, 6)
    _write_file(str(d / "b.fastq.gz"), rng, 6)
    out = tmp_path / "out"
    cfg = TopsicleConfig(input_dir=str(d), output_dir=str(out),
                         pattern="CCCTAAA", slide=6, batch_size=8)
    res1 = JaxEngine(cfg).run()
    csv1 = (out / "telolengths_all.csv").read_bytes()

    # simulate interruption of file b: drop b from the manifest and its
    # rows from the CSV tail
    m = RunManifest(str(out))
    key_b = [k for k in m._done if "b.fastq" in k]
    assert key_b
    del m._done[key_b[0]]
    m.mark_done(str(d / "a.fastq.gz"), 5, m.rows_for(str(d / "a.fastq.gz"), 5))

    cfg2 = TopsicleConfig(input_dir=str(d), output_dir=str(out),
                          pattern="CCCTAAA", slide=6, batch_size=8, resume=True)
    res2 = JaxEngine(cfg2).run()
    # the resumed run's CSV is BYTE-identical to the uninterrupted one
    # (kept rows re-emitted at their canonical phrase x file position)
    assert (out / "telolengths_all.csv").read_bytes() == csv1
    assert len(res1) == len(res2)


def test_resume_byte_identical_multi_k(tmp_path):
    """Interrupt in the middle of a 2-k sweep; the resumed CSV must be
    byte-identical to the uninterrupted run's, and the aggregates must
    use full-precision TRCs from the manifest (not the 3-decimal CSV)."""
    rng = random.Random(11)
    d = tmp_path / "in"
    d.mkdir()
    _write_file(str(d / "a.fastq.gz"), rng, 6)
    _write_file(str(d / "b.fastq.gz"), rng, 6)
    out = tmp_path / "out"
    kw = dict(input_dir=str(d), output_dir=str(out), pattern="CCCTAAA",
              telophrase=[4, 5], slide=6, batch_size=8)
    res1 = JaxEngine(TopsicleConfig(**kw)).run()
    csv1 = (out / "telolengths_all.csv").read_bytes()

    # simulate a crash after (a, 4), (b, 4), (a, 5): drop (b, 5)
    m = RunManifest(str(out))
    key_b5 = [k for k in m._done if "b.fastq" in k and k.endswith("::5")]
    assert key_b5
    del m._done[key_b5[0]]
    m.mark_done(str(d / "a.fastq.gz"), 4, m.rows_for(str(d / "a.fastq.gz"), 4),
                trcs=m.trcs_for(str(d / "a.fastq.gz"), 4))

    res2 = JaxEngine(TopsicleConfig(resume=True, **kw)).run()
    assert (out / "telolengths_all.csv").read_bytes() == csv1
    # full-precision TRCs recovered through the manifest
    assert sorted(r.trc for r in res1) == sorted(r.trc for r in res2)


def test_resume_fresh_output(tmp_path):
    rng = random.Random(6)
    d = tmp_path / "in"
    d.mkdir()
    _write_file(str(d / "a.fastq.gz"), rng, 4)
    out = tmp_path / "out"
    cfg = TopsicleConfig(input_dir=str(d), output_dir=str(out),
                         pattern="CCCTAAA", slide=6, batch_size=8, resume=True)
    res = JaxEngine(cfg).run()
    assert len(res) > 0
    # all units now recorded; a second resume run recomputes nothing but
    # reports identical rows
    res2 = JaxEngine(TopsicleConfig(
        input_dir=str(d), output_dir=str(out), pattern="CCCTAAA",
        slide=6, batch_size=8, resume=True)).run()
    assert sorted((r.read_id, r.telo_length) for r in res) == \
           sorted((r.read_id, r.telo_length) for r in res2)


def test_stage_timers_summary():
    t = StageTimers()
    with t.stage("x"):
        pass
    t.count(reads=3, bases=3000)
    s = t.summary()
    assert "x=" in s and "3 reads" in s


def test_global_mode_resume_byte_identical(tmp_path):
    """--resume in shardMode=global: interrupted+resumed CSV equals an
    uninterrupted run's, byte for byte (kept units re-emitted at their
    canonical file position; recomputed units re-run on the mesh)."""
    rng = random.Random(11)
    d = tmp_path / "in"
    d.mkdir()
    _write_file(str(d / "a.fastq.gz"), rng, 6)
    _write_file(str(d / "b.fastq.gz"), rng, 6)
    out = tmp_path / "out"
    cfg = TopsicleConfig(input_dir=str(d), output_dir=str(out),
                         pattern="CCCTAAA", slide=6, batch_size=8,
                         shard_mode="global")
    JaxEngine(cfg).run()
    csv1 = (out / "telolengths_all.csv").read_bytes()
    log1 = [l for l in (out / "topsicle_run.log").read_text().splitlines()
            if "median telomere" in l or "recommended" in l]

    m = RunManifest(str(out))
    key_b = [k for k in m._done if "b.fastq" in k]
    assert key_b, "global mode must mark units done for resume"
    del m._done[key_b[0]]
    m.mark_done(str(d / "a.fastq.gz"), 5, m.rows_for(str(d / "a.fastq.gz"), 5))

    cfg2 = TopsicleConfig(input_dir=str(d), output_dir=str(out),
                          pattern="CCCTAAA", slide=6, batch_size=8,
                          shard_mode="global", resume=True)
    JaxEngine(cfg2).run()
    assert (out / "telolengths_all.csv").read_bytes() == csv1
    log2 = [l for l in (out / "topsicle_run.log").read_text().splitlines()
            if "median telomere" in l or "recommended" in l]
    # aggregate lines recomputed identically (same values, order)
    assert [l.split("]")[1] for l in log2[-len(log1):]] == \
        [l.split("]")[1] for l in log1]
