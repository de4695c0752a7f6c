"""Input-envelope behavior: wrapped FASTQ + unrecognized files.

PARITY.md deviations 9-10 (round-4 items): both readers accept
Bio.SeqIO's wrapped/multi-line FASTQ (allsteps.py:127-149 delegates to
Bio.SeqIO, which accepts it), and an unsniffable file produces the same
loud logged skip with or without the native C++ library — instead of
the pure-Python path silently yielding zero records while the native
path errors (the round-3 asymmetry).
"""

import os

import numpy as np
import pytest

from topsicle_tpu.config import TopsicleConfig
from topsicle_tpu.io import batch as batching
from topsicle_tpu.io import reader
from topsicle_tpu.io.writer import RunLog
from topsicle_tpu.pipeline import JaxEngine

WRAPPED = (
    "@r1 some desc\nACGTACGTAC\nGTACGT\n+\nIIIIIIIIII\nIIIIII\n"
    "@r2\nAAAACCCTAA\n+r2\n@@@@IIIIII\n"   # quality legally starts with '@'
)
FOURLINE = (
    "@r1 some desc\nACGTACGTACGTACGT\n+\nIIIIIIIIIIIIIIII\n"
    "@r2\nAAAACCCTAA\n+r2\n@@@@IIIIII\n"
)


def test_wrapped_fastq_equals_fourline(tmp_path):
    a = tmp_path / "w.fastq"
    b = tmp_path / "f.fastq"
    a.write_text(WRAPPED)
    b.write_text(FOURLINE)
    ra = list(reader.parse_records(str(a)))
    rb = list(reader.parse_records(str(b)))
    assert [(r.id, r.seq, r.qual) for r in ra] == \
        [(r.id, r.seq, r.qual) for r in rb]
    assert ra[0].seq == "ACGTACGTACGTACGT"
    assert ra[1].qual == "@@@@IIIIII"


def test_fastq_quality_shorter_raises(tmp_path):
    p = tmp_path / "bad.fastq"
    p.write_text("@r1\nACGTACGT\n+\nIIII\n")   # qual 4 < seq 8: eats to EOF
    with pytest.raises(ValueError, match="quality shorter"):
        list(reader.parse_records(str(p)))


def test_fastq_quality_longer_raises(tmp_path):
    p = tmp_path / "bad.fastq"
    p.write_text("@r1\nACGT\n+\nIIIIII\n@r2\nAAAA\n+\nIIII\n")
    with pytest.raises(ValueError, match="quality longer"):
        list(reader.parse_records(str(p)))


def test_unrecognized_file_raises(tmp_path):
    p = tmp_path / "stray.txt"
    p.write_text("this is not sequence data\n")
    with pytest.raises(ValueError, match="cannot determine input format"):
        list(reader.parse_records(str(p)))


def test_wrapped_fastq_gz(tmp_path):
    import gzip

    p = tmp_path / "w.fastq.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(WRAPPED)
    recs = list(reader.parse_records(str(p)))
    assert [r.seq for r in recs] == ["ACGTACGTACGTACGT", "AAAACCCTAA"]


def test_native_wrapped_matches_python(tmp_path):
    native = pytest.importorskip("topsicle_tpu.native")
    if not native.native_available():
        pytest.skip("C++ toolchain/zlib unavailable")
    p = tmp_path / "w.fastq"
    p.write_text(WRAPPED)
    want = [(r.id, batching.encode_read(r.seq))
            for r in reader.parse_records(str(p))]
    got = list(native.NativeReader(str(p), 0))
    assert len(got) == len(want)
    for (wid, wc), (gid, gc) in zip(want, got):
        assert gid == wid
        np.testing.assert_array_equal(gc, wc)


def test_native_unrecognized_errors(tmp_path):
    native = pytest.importorskip("topsicle_tpu.native")
    if not native.native_available():
        pytest.skip("C++ toolchain/zlib unavailable")
    p = tmp_path / "stray.txt"
    p.write_text("this is not sequence data\n")
    with pytest.raises(OSError):
        native.NativeReader(str(p), 0)


# ---- engine level: identical logged skip either way ---------------------

def _good_fastq(path):
    """Two eligible reads with telomeric starts so rows are produced."""
    rng = np.random.default_rng(5)
    with open(path, "w") as fh:
        for i in range(2):
            telo = ("CCCTAAA" * 200)[:1300]
            rest = "".join(rng.choice(list("ACGT"), 9000))
            seq = telo + rest
            fh.write(f"@read{i}\n{seq}\n+\n{'I' * len(seq)}\n")


@pytest.mark.parametrize("use_native", [False, None])
def test_midfile_truncation_contributes_nothing(tmp_path, use_native):
    """A file that dies MID-stream (truncated gzip after several full
    blocks) must contribute zero CSV rows and zero aggregate entries
    even though step-2 batches for its early blocks may already have
    launched (the round-4 streaming pipeline buffers a unit's rows
    until the unit completes), and its unit stays un-done."""
    import gzip

    import jax

    jax.config.update("jax_platforms", "cpu")
    indir = tmp_path / "in"
    indir.mkdir()
    _good_fastq(indir / "agood.fastq")
    # telomeric reads so early blocks produce passers, then truncation
    rng = np.random.default_rng(9)
    buf = []
    for i in range(12):
        seq = ("CCCTAAA" * 220)[:1500] + "".join(rng.choice(list("ACGT"), 9100))
        buf.append(f"@t{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    payload = gzip.compress("".join(buf).encode())
    (indir / "btrunc.fastq.gz").write_bytes(payload[: len(payload) // 2])

    out = tmp_path / f"o_{use_native}"
    cfg = TopsicleConfig(
        input_dir=str(indir), output_dir=str(out), pattern="CCCTAAA",
        slide=6, batch_size=4, native_io=use_native)
    eng = JaxEngine(cfg, log=RunLog(str(out), echo=False))
    results = eng.run()
    assert len(results) == 2                      # only the good file
    assert all(r.read_id.startswith("read") for r in results)
    body = (out / "telolengths_all.csv").read_text().splitlines()[1:]
    assert len(body) == 2 and all(",read" in r for r in body)
    log_text = (out / "topsicle_run.log").read_text()
    assert "skipping this file" in log_text and "btrunc" in log_text
    from topsicle_tpu.utils import RunManifest

    m = RunManifest(str(out))
    assert m.is_done(str(indir / "agood.fastq"), 5)
    assert not m.is_done(str(indir / "btrunc.fastq.gz"), 5)


def test_midfile_truncation_removes_partial_extras(tmp_path):
    """--rawcountpattern extras written by a unit's early batches are
    removed when the unit later fails mid-stream."""
    import gzip

    import jax

    jax.config.update("jax_platforms", "cpu")
    indir = tmp_path / "in"
    indir.mkdir()
    rng = np.random.default_rng(11)
    buf = []
    for i in range(12):
        seq = ("CCCTAAA" * 220)[:1500] + "".join(rng.choice(list("ACGT"), 9100))
        buf.append(f"@t{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    payload = gzip.compress("".join(buf).encode())
    (indir / "trunc.fastq.gz").write_bytes(payload[: len(payload) // 2])
    out = tmp_path / "o"
    cfg = TopsicleConfig(
        input_dir=str(indir), output_dir=str(out), pattern="CCCTAAA",
        slide=6, batch_size=4, maxlengthtelo=2048, rawcountpattern=True,
        native_io=False)
    results = JaxEngine(cfg, log=RunLog(str(out), echo=False)).run()
    assert results == []
    assert not list(out.glob("rawcount_*.csv"))


def test_global_mode_skips_stray_file(tmp_path):
    """shardMode=global reaches the same logged-skip outcome through
    its block stream (the stray file's unit stays un-done)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    indir = tmp_path / "in"
    indir.mkdir()
    _good_fastq(indir / "good.fastq")
    (indir / "stray.txt").write_text("not sequence data\n")
    out = tmp_path / "out"
    cfg = TopsicleConfig(
        input_dir=str(indir), output_dir=str(out), pattern="CCCTAAA",
        slide=6, batch_size=8, shard_mode="global", native_io=False)
    results = JaxEngine(cfg, log=RunLog(str(out), echo=False)).run()
    assert len(results) == 2
    log_text = (out / "topsicle_run.log").read_text()
    assert "skipping this file" in log_text and "stray.txt" in log_text


@pytest.mark.parametrize("use_native", [False, None])
def test_engine_skips_stray_file_identically(tmp_path, use_native):
    """A stray text file in --inputDir: logged skip + remaining files
    processed, with the pure-Python reader (native_io=False) and the
    auto/native path (native_io=None) producing identical CSVs and the
    same logged outcome (PARITY.md deviation 9)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    indir = tmp_path / "in"
    indir.mkdir()
    _good_fastq(indir / "good.fastq")
    (indir / "stray.txt").write_text("not sequence data\n")

    out = tmp_path / f"out_{use_native}"
    cfg = TopsicleConfig(
        input_dir=str(indir), output_dir=str(out), pattern="CCCTAAA",
        slide=6, batch_size=8, native_io=use_native)
    eng = JaxEngine(cfg, log=RunLog(str(out), echo=False))
    results = eng.run()
    assert len(results) == 2          # good file fully processed
    log_text = (out / "topsicle_run.log").read_text()
    assert "skipping this file" in log_text
    assert "stray.txt" in log_text

    csv = (out / "telolengths_all.csv").read_bytes()
    # reference run without the stray file: identical CSV
    clean = tmp_path / "clean"
    clean.mkdir()
    _good_fastq(clean / "good.fastq")
    out2 = tmp_path / f"out2_{use_native}"
    cfg2 = TopsicleConfig(
        input_dir=str(clean), output_dir=str(out2), pattern="CCCTAAA",
        slide=6, batch_size=8, native_io=use_native)
    JaxEngine(cfg2, log=RunLog(None, echo=False)).run()
    assert (out2 / "telolengths_all.csv").read_bytes() == csv
