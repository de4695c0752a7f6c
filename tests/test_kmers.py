"""k-mer table generation vs the reference's verified behavior."""

import numpy as np
import pytest

from topsicle_tpu.kmers import (
    encode_ascii,
    encode_kmer_codes,
    pack_kmer_table,
    patterns_to_search,
    telophrase_kmers,
)

# The exact 14-k-mer list the reference logs for CCCTAAA/k=5
# (Topsicle_demo/result_justone/topsicle_run.log:21).
DEMO_KMERS = [
    "AAACC", "AACCC", "ACCCT", "CCCTA", "CCTAA", "CTAAA", "TAAAC",
    "TTTGG", "TTGGG", "TGGGA", "GGGAT", "GGATT", "GATTT", "ATTTG",
]


def test_demo_kmer_list_exact_order():
    assert telophrase_kmers("CCCTAAA", 5) == DEMO_KMERS


def test_lowercase_pattern_uppercased():
    assert telophrase_kmers("ccctaaa", 5) == DEMO_KMERS


def test_human_pattern_k4():
    kmers = telophrase_kmers("CCCTAA", 4)
    origins = kmers[: len(kmers) // 2]
    assert origins == sorted(origins)
    assert len(kmers) == 2 * len(set(origins))
    # complements are positionwise ACGT->TGCA without reversal
    comp = dict(zip("ACGT", "TGCA"))
    for o, c in zip(origins, kmers[len(kmers) // 2 :]):
        assert c == "".join(comp[b] for b in o)


def test_k_equals_pattern_length():
    # k == len(pattern): rotations of the full repeat
    kmers = telophrase_kmers("CCCTAAA", 7)
    assert len(kmers) == 14
    assert all(len(s) == 7 for s in kmers)


def test_k_exceeds_pattern_length():
    # k > len(pattern): substrings come from the doubled pattern, so
    # 8-mers of CCCTAAA are the 8-windows of CCCTAAACCCTAAA
    doubled = "CCCTAAACCCTAAA"
    want = sorted({doubled[i:i + 8] for i in range(len(doubled) - 7)})
    comp = str.maketrans("ACGT", "TGCA")
    got = telophrase_kmers("CCCTAAA", 8)
    assert got == want + [s.translate(comp) for s in want]
    # beyond 2*len no substrings exist
    assert telophrase_kmers("CCCTAAA", 15) == []


def test_multi_pattern_refused():
    with pytest.raises(ValueError):
        patterns_to_search("AACC|ACCG", 4)


def test_list_pattern_passthrough_uppercased():
    assert patterns_to_search(["acgt", "TTAA"], 4) == ["ACGT", "TTAA"]


def test_encode_ascii_cases_and_invalid():
    got = encode_ascii(b"ACGTacgtNX-")
    assert got.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 4]


def test_pack_kmer_table_rolling_code():
    kmers = ["AC", "CA", "TT"]
    codes = pack_kmer_table(kmers)
    # code = sum_j base[j] * 4**j
    assert codes.tolist() == [0 + 1 * 4, 1 + 0 * 4, 3 + 3 * 4]


def test_pack_kmer_table_distinct():
    kmers = telophrase_kmers("CCCTAAA", 5)
    codes = pack_kmer_table(kmers)
    assert len(set(codes.tolist())) == len(kmers)
    assert (codes >= 0).all()
    em = encode_kmer_codes(kmers)
    assert em.shape == (14, 5)
    assert (em < 4).all()
