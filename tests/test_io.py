"""Host I/O layer vs the demo data and Biopython-equivalent behavior."""

import gzip
import os

from tests.conftest import requires_demo

from topsicle_tpu.io.reader import extension_format, parse_records, sniff_format
from topsicle_tpu.io.writer import file_label, subset_path, write_record
from topsicle_tpu.io.reader import SeqRecord


@requires_demo
def test_demo_parse_counts(demo_fastq):
    recs = list(parse_records(demo_fastq))
    assert len(recs) == 44
    assert sum(len(r.seq) for r in recs) == 815896  # SURVEY.md §6


@requires_demo
def test_demo_sniff(demo_fastq):
    assert sniff_format(demo_fastq) == "fastq"


@requires_demo
def test_subset_roundtrip_bytes(demo_fastq, demo_subset, tmp_path):
    """Rewriting the 17 passing reads must byte-match the reference's
    committed subset file (Biopython SeqIO.write format)."""
    with open(demo_subset) as fh:
        want = fh.read()
    keep_ids = {
        line[1:].split()[0]
        for line in want.splitlines()[::4]
    }
    out = tmp_path / "subset.fastq"
    with open(out, "w") as fh:
        for rec in parse_records(demo_fastq):
            if rec.id in keep_ids:
                write_record(fh, rec, "fastq")
    assert out.read_text() == want


def test_fasta_parse_multiline(tmp_path):
    p = tmp_path / "x.fasta"
    p.write_text(">r1 some description\nACGT\nACGT\n>r2\nTTTT\n")
    recs = list(parse_records(str(p)))
    assert [r.id for r in recs] == ["r1", "r2"]
    assert recs[0].seq == "ACGTACGT"
    assert recs[0].header == "r1 some description"


def test_fasta_write_wraps_at_60(tmp_path):
    rec = SeqRecord(id="r", header="r", seq="A" * 130)
    p = tmp_path / "o.fasta"
    with open(p, "w") as fh:
        write_record(fh, rec, "fasta")
    lines = p.read_text().splitlines()
    assert lines[0] == ">r"
    assert [len(x) for x in lines[1:]] == [60, 60, 10]


def test_gzip_roundtrip(tmp_path):
    p = tmp_path / "x.fastq.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("@r1 d\nACGT\n+r1\nIIII\n")
    recs = list(parse_records(str(p)))
    assert recs[0].id == "r1"
    assert recs[0].qual == "IIII"
    assert sniff_format(str(p)) == "fastq"


def test_extension_format_rules():
    # main.py:68-81 — only .fastq/.fq(.gz) are fastq; all else fasta
    assert extension_format("a.fastq.gz") == "fastq"
    assert extension_format("a.fq") == "fastq"
    assert extension_format("a.fasta.gz") == "fasta"
    assert extension_format("a.txt") == "fasta"


def test_file_label_strips_one_extension():
    assert file_label("/x/y/A.fastq.gz") == "A.fastq"
    assert file_label("A.fasta") == "A"


def test_subset_path_name(tmp_path):
    p = subset_path(str(tmp_path), "/d/X.fastq.gz", 0.7)
    assert os.path.basename(p) == "X.fastq_trc_over_0.7.fastq"


def test_truncated_gzip_skipped_not_fatal(tmp_path):
    """A corrupt/truncated .gz input is logged and skipped; other files
    still produce their rows (the reference's pool run dies instead)."""
    import gzip
    import random

    from topsicle_tpu.config import TopsicleConfig
    from topsicle_tpu.pipeline import JaxEngine

    rng = random.Random(5)
    d = tmp_path / "in"
    d.mkdir()
    pat = "CCCTAAA"

    def telo_read(tl, total):
        telo = (pat * (tl // len(pat) + 1))[:tl]
        return telo + "".join(rng.choice("ACGT") for _ in range(total - tl))

    good = d / "good.fastq.gz"
    with gzip.open(good, "wt") as fh:
        for i in range(3):
            s = telo_read(800, 11000)
            fh.write(f"@g{i}\n{s}\n+\n{'I'*len(s)}\n")
    # valid gzip header, truncated stream
    full = d / "bad.fastq.gz"
    with gzip.open(full, "wt") as fh:
        for i in range(3):
            s = telo_read(800, 11000)
            fh.write(f"@b{i}\n{s}\n+\n{'I'*len(s)}\n")
    blob = full.read_bytes()
    full.write_bytes(blob[: len(blob) // 2])

    out = tmp_path / "out"
    res = JaxEngine(TopsicleConfig(input_dir=str(d), output_dir=str(out),
                                   pattern=pat, slide=6, batch_size=4)).run()
    ids = {r.read_id for r in res}
    assert {"g0", "g1", "g2"} <= ids
    assert not any(i.startswith("b") for i in ids)
    log = (out / "topsicle_run.log").read_text()
    assert "skipping this file" in log


def test_garbage_file_yields_no_reads(tmp_path):
    """A non-FASTA/FASTQ file sniffs to no format -> zero reads, no
    crash (reference behavior: Biopython parses nothing)."""
    from topsicle_tpu.config import TopsicleConfig
    from topsicle_tpu.pipeline import JaxEngine

    d = tmp_path / "in"
    d.mkdir()
    (d / "junk.fastq").write_text("this is not sequence data\nat all\n")
    out = tmp_path / "out"
    res = JaxEngine(TopsicleConfig(input_dir=str(d), output_dir=str(out),
                                   pattern="CCCTAAA", slide=6)).run()
    assert res == []


def test_ends_batch_flat_matches_per_read():
    """Vectorized block-level ends assembly (io.batch.ends_batch_flat)
    must equal the per-read ends_batch/extract_ends path exactly,
    including short-read padding and the reversed end row."""
    import numpy as np

    from topsicle_tpu.io import batch as batching

    rng = np.random.default_rng(3)
    reads = [rng.integers(0, 5, int(n), dtype=np.uint8)
             for n in rng.integers(20, 2500, 41)]
    flat = np.concatenate(reads)
    offs = np.zeros(len(reads) + 1, np.int64)
    offs[1:] = np.cumsum([len(r) for r in reads])
    for no_bp in (1000, 64, 7):
        want = batching.ends_batch(reads, no_bp)
        got, n = batching.ends_batch_flat(flat, offs, no_bp)
        assert (got == want).all()
        assert (n == np.minimum([len(r) for r in reads], no_bp)).all()
