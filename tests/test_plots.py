"""Visualization layer: overview CLI artifacts on the demo data.

The reference's committed heatmap_rawcount_1.csv / rawcount_4_1.csv are
stale (they match no read in the shipped demo input — SURVEY.md §8 item
12), so these tests validate schema + semantics, not byte equality with
the stale artifacts.
"""

import os

import pytest

from tests.conftest import requires_demo

from topsicle_tpu.plots.overview import (
    nonoverlap_positions,
    nonoverlap_with_capture,
)


def test_nonoverlap_positions_matches_re():
    import re

    for hay, needle in [("AAAA", "AA"), ("ACACAC", "AC"), ("CCCTAAACCCTAAA", "CCCTAAA")]:
        want = [m.start() for m in re.finditer(needle, hay)]
        assert nonoverlap_positions(hay, needle) == want


def test_nonoverlap_with_capture_matches_re():
    import re

    hay = "CCCTAAACCCTAAACCCTAAAGG"
    for needle, extra in [("CCCTA", 2), ("CCTAA", 0), ("AAACC", 3)]:
        regex = re.compile(re.escape(needle) + f"(.{{{extra}}})")
        want = [(m.start(), m.group(1)) for m in regex.finditer(hay)]
        assert nonoverlap_with_capture(hay, needle, extra) == want


@requires_demo
def test_overview_cli_artifacts(demo_fastq, tmp_path):
    from topsicle_tpu.plot_cli import main

    rc = main([
        "--inputDir", demo_fastq,
        "--outputDir", str(tmp_path),
        "--pattern", "CCCTAAA",
        "--recfindingpattern",
        "--rawcount",
    ])
    assert rc == 0
    assert (tmp_path / "descriptive_plot_1.png").exists()
    assert (tmp_path / "heatmap_1.png").exists()
    csv = (tmp_path / "heatmap_rawcount_1.csv").read_text().splitlines()
    assert csv[0] == "Pattern,Match,read id"
    # rows carry the reference's list-repr read id format
    assert csv[1].count(",") == 2 and "['" in csv[1]
    # temp filtered files cleaned up
    assert not any(f.startswith("temp_reads_in_heatmap") for f in os.listdir(tmp_path))


@requires_demo
def test_changepoint_plot_saved(demo_fastq, tmp_path):
    """--plot emits plot_{phrase}_{n}.png per passing read."""
    from topsicle_tpu.config import TopsicleConfig
    from topsicle_tpu.pipeline import JaxEngine

    cfg = TopsicleConfig(
        input_dir=demo_fastq, output_dir=str(tmp_path), pattern="CCCTAAA",
        slide=6, batch_size=8, plot=True, read_check="ERR11436636.206253",
    )
    JaxEngine(cfg).run()
    assert (tmp_path / "plot_5_1.png").exists()
