"""Oracle engine vs the demo golden outputs (bit-exact contract) plus
unit tests of the algorithm pieces."""

import math

import pytest

from tests.conftest import requires_demo

from topsicle_tpu.config import TopsicleConfig
from topsicle_tpu.oracle import (
    OracleEngine,
    binseg_l2_single,
    boundary_detect,
    count_nonoverlapping,
    step1_trc,
    window_signal,
)
from topsicle_tpu.kmers import telophrase_kmers


def test_count_nonoverlapping_matches_re():
    import re

    cases = [
        ("AAAAAA", "AA"),      # overlapping self-match: re gives 3
        ("ACACACA", "ACA"),
        ("", "AC"),
        ("ACGT", "ACGT"),
        ("TTTT", "A"),
    ]
    for hay, needle in cases:
        want = len(list(re.finditer(needle, hay)))
        assert count_nonoverlapping(hay, needle) == want, (hay, needle)


def test_step1_trc_tail_and_tie():
    kmers = ["AA", "TT"]
    # telomere-ish start: AA-rich
    seq = "A" * 1000 + "G" * 9000
    km, tail, trc = step1_trc(seq, kmers, pattern_len=2, no_bp=1000, cutoff=0.5)
    assert km == "AA" and tail == "forward"
    assert trc == pytest.approx(500 / (1000 / 2))
    # equal ends -> reverse branch wins (strict > for forward, main ref
    # allsteps.py:193)
    seq_eq = "A" * 1000 + "G" * 8000 + "T" * 1000
    # reversed end = 'T'*1000 -> TT matches; counts equal -> reverse
    km2, tail2, _ = step1_trc(seq_eq, kmers, 2, 1000, 0.5)
    assert tail2 == "reverse"


def test_step1_cutoff_strict():
    kmers = ["AA"]
    seq = "AG" * 5000  # zero AA matches
    assert step1_trc(seq, kmers, 2, 1000, cutoff=0.0) is None or True
    # TRC == cutoff exactly -> rejected (strict >)
    # 350 matches of AA in first 1000bp => trc = 350/(1000/2) = 0.7
    s = ("AAC" * 334)[:1000] + "G" * 9000
    n = count_nonoverlapping(s[:1000], "AA")
    trc = n / (1000 / 2)
    got = step1_trc(s, kmers, 2, 1000, cutoff=trc)
    assert got is None


def test_window_signal_off_by_one():
    # windows are windowSize-1 characters (allsteps.py:221-224)
    kmers = ["AC"]
    seq = "X" * 0 + "AC" * 200  # 400 bp
    starts, means = window_signal(seq, "forward", kmers, window_size=100,
                                  slide=10, trimfirst=0, maxlengthtelo=400)
    assert starts[0] == 0
    # window content = s[0:99] -> 'AC'*49 + 'A' -> 49 matches
    assert means[0] == 49.0
    # last start obeys range(0, len - w + 1, step)
    assert starts[-1] <= 400 - 100


def test_window_signal_reverse_tail():
    kmers = ["AAA"]
    seq = "G" * 300 + "A" * 300
    starts, means = window_signal(seq, "reverse", kmers, 100, 50, 0, 600)
    # reversed: A's first
    assert means[0] > means[-1]


def test_or1_floor():
    kmers = ["AC", "GG"]
    seq = "AC" * 300
    _, means = window_signal(seq, "forward", kmers, 100, 100, 0, 600)
    # GG never matches -> floored to 1; AC matches 49 -> mean (49+1)/2
    assert means[0] == 25.0


def test_binseg_simple_step():
    y = [5.0] * 50 + [1.0] * 50
    t = binseg_l2_single(y)
    assert t == 50
    # jump quantization: true break at 48 -> nearest admissible multiple of 5
    y2 = [5.0] * 48 + [1.0] * 52
    t2 = binseg_l2_single(y2)
    assert t2 % 5 == 0
    assert t2 in (45, 50)


def test_binseg_constant_first_best_wins():
    y = [1.0] * 40
    assert binseg_l2_single(y) == 5  # all gains equal -> first candidate


def test_binseg_no_candidates():
    assert binseg_l2_single([1.0, 2.0, 3.0]) is None
    assert binseg_l2_single([]) is None


def test_boundary_detect_synthetic():
    kmers = telophrase_kmers("CCCTAAA", 5)
    telo = ("CCCTAAA" * 400)[:2000]
    rest = ("GATCGGCTAG" * 2000)[:18000]
    seq = telo + rest
    b = boundary_detect(seq, "forward", kmers, 100, 6, 100, 20000)
    assert 1900 <= b <= 2150  # boundary near 2000, quantized by slide*jump


@requires_demo
def test_oracle_demo_bitexact(demo_fastq, demo_csv, tmp_path):
    """North-star oracle test: byte-identical telolengths_all.csv
    (BASELINE.md correctness anchor)."""
    cfg = TopsicleConfig(
        input_dir=demo_fastq,
        output_dir=str(tmp_path),
        pattern="CCCTAAA",
        slide=6,
    )
    eng = OracleEngine(cfg)
    results = eng.run()
    assert len(results) == 17

    with open(demo_csv, "rb") as fh:
        want = fh.read()
    with open(tmp_path / "telolengths_all.csv", "rb") as fh:
        got = fh.read()
    assert got == want


@requires_demo
def test_oracle_demo_aggregates(demo_fastq, tmp_path):
    """Log-level aggregate stats: median 2110 / vertex 0.897 / filtered
    median 2050 (topsicle_run.log:25-27)."""
    from topsicle_tpu import aggregate

    cfg = TopsicleConfig(
        input_dir=demo_fastq, output_dir=str(tmp_path), pattern="CCCTAAA", slide=6,
    )
    results = OracleEngine(cfg).run()
    trc = [r.trc for r in results]
    telo = [float(r.telo_length) for r in results]
    s = aggregate.summarize_phrase(5, trc, telo, 0.7)
    assert s.median_telo == pytest.approx(2110.0)
    assert f"{s.vertex_trc:.3f}" == "0.897"
    assert s.filtered_median_telo == pytest.approx(2050.0)


@requires_demo
def test_oracle_demo_subset_file(demo_fastq, demo_subset, tmp_path):
    cfg = TopsicleConfig(
        input_dir=demo_fastq, output_dir=str(tmp_path), pattern="CCCTAAA", slide=6,
    )
    OracleEngine(cfg).run()
    name = "Col-0-6909_GWHBDNP00000001.1_nano_right.fastq_trc_over_0.7.fastq"
    got = (tmp_path / name).read_text()
    with open(demo_subset) as fh:
        want = fh.read()
    assert got == want


def test_override_guard(tmp_path):
    p = tmp_path / "telolengths_all.csv"
    p.write_text("junk")
    cfg = TopsicleConfig(
        input_dir=str(tmp_path / "missing"), output_dir=str(tmp_path),
        pattern="CCCTAAA",
    )
    with pytest.raises(FileExistsError):
        OracleEngine(cfg).run()
