"""The scan-free 'sum' strategy: windowed occurrence sums are exact
greedy counts for aperiodic k-mer tables (no k-mer self-overlaps).

Covers: the periodicity helpers, bit-identity of 'sum' vs the scan
strategies on aperiodic tables (with Ns / ragged lengths), automatic
model routing (sum for aperiodic tables, scan fallback for periodic
ones), and end-to-end boundary agreement against the oracle.
"""

import random
import warnings

import numpy as np
import pytest

from topsicle_tpu.io import batch
from topsicle_tpu.kmers import all_aperiodic, smallest_period, telophrase_kmers
from topsicle_tpu.models import TelomereScanModel
from topsicle_tpu.oracle import count_nonoverlapping


@pytest.fixture(scope="module")
def rng():
    return random.Random(20260821)


def _random_seq(rng, n, alphabet="ACGT", n_prob=0.0):
    return "".join(
        "N" if (n_prob and rng.random() < n_prob) else rng.choice(alphabet)
        for _ in range(n)
    )


def _telomere_like(rng, pattern, telo_len, total, err=0.05):
    telo = (pattern * (telo_len // len(pattern) + 1))[:telo_len]
    telo = "".join(c if rng.random() > err else rng.choice("ACGT") for c in telo)
    return telo + _random_seq(rng, total - len(telo))


def test_periodicity_helpers():
    assert smallest_period("CCCTA") == 5
    assert smallest_period("ACA") == 2
    assert smallest_period("AAAA") == 1
    assert smallest_period("ATAT") == 2
    assert smallest_period("A") == 1          # aperiodic by definition
    assert all_aperiodic(telophrase_kmers("CCCTAAA", 5))   # the default table
    assert all_aperiodic(telophrase_kmers("CCCTAAA", 4))
    # rotations can self-overlap: ACCCTA has period 5, CCC period 1
    assert not all_aperiodic(telophrase_kmers("CCCTAAA", 6))
    assert not all_aperiodic(telophrase_kmers("CCCTAAA", 7))
    assert not all_aperiodic(telophrase_kmers("CCCTAAA", 3))
    assert not all_aperiodic(telophrase_kmers("CCCTAAA", 8))  # period 7 < 8
    assert not all_aperiodic(["AAAA", "CCCTA"])
    assert all_aperiodic(telophrase_kmers("CCCTAAA", 1))
    # complementation preserves periods: origin-half verdict == whole table
    for pat, k in [("CCCTAAA", 5), ("AC", 3), ("TTAGGG", 4)]:
        tbl = telophrase_kmers(pat, k)
        half = len(tbl) // 2
        assert all_aperiodic(tbl[:half]) == all_aperiodic(tbl)


def test_sum_window_counts_equal_scan_on_aperiodic_table(rng):
    """'sum' vs 'offset'/'phase' on real match bits from an aperiodic
    table, with Ns and ragged suffix padding in the batch."""
    import jax.numpy as jnp

    from topsicle_tpu.kmers import encode_ascii, pack_kmer_table
    from topsicle_tpu.ops import match_positions, window_nonoverlap_counts

    for pat, k, wsize, slide in [("CCCTAAA", 5, 100, 6), ("CCCTAAA", 4, 100, 7),
                                 ("TTAGGG", 4, 60, 5), ("CCCTAAA", 1, 100, 6)]:
        kmers = telophrase_kmers(pat, k)
        assert all_aperiodic(kmers)
        table = jnp.asarray(pack_kmer_table(kmers))
        L = 1900
        seqs = [
            _telomere_like(rng, pat, 700, L),
            _random_seq(rng, L, n_prob=0.03),
            (pat * (L // len(pat) + 1))[:L],
            _random_seq(rng, L // 3) + "\x00" * (L - L // 3),  # padded tail
        ]
        enc = np.stack([encode_ascii(s.encode("latin1")) for s in seqs])
        m = match_positions(jnp.asarray(enc), table, k)
        W = (L - wsize) // slide + 1
        got = window_nonoverlap_counts(m, k, wsize, slide, W, strategy="sum")
        want = window_nonoverlap_counts(m, k, wsize, slide, W, strategy="offset")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want), err_msg=pat)
        want2 = window_nonoverlap_counts(m, k, wsize, slide, W, strategy="phase")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want2))


def test_sum_greedy_equals_chunked_on_aperiodic_table(rng):
    import jax.numpy as jnp

    from topsicle_tpu.kmers import encode_ascii, pack_kmer_table
    from topsicle_tpu.ops.match import (greedy_count_chunked, greedy_count_sum,
                                        match_positions)

    for k, L in [(5, 64), (5, 999), (4, 500), (1, 100)]:
        kmers = telophrase_kmers("CCCTAAA", k)
        table = jnp.asarray(pack_kmer_table(kmers))
        seqs = [_telomere_like(rng, "CCCTAAA", L // 2, L),
                _random_seq(rng, L, n_prob=0.05)]
        enc = np.stack([encode_ascii(s.encode()) for s in seqs])
        m = match_positions(jnp.asarray(enc), table, k)
        np.testing.assert_array_equal(
            np.asarray(greedy_count_sum(m, k)),
            np.asarray(greedy_count_chunked(m, k)),
        )


def test_boundary_sum_signal_equals_per_k_floor_sum(rng):
    """The fused y_int (total-plane sum + presence popcount) equals
    sum_K max(count_K, 1) from per-K windowed counts — including tables
    with duplicate entries (pattern ACTG at k=2: every k-mer appears in
    both the origin and complement halves)."""
    import jax.numpy as jnp

    from topsicle_tpu.kmers import encode_ascii, pack_kmer_table
    from topsicle_tpu.ops import (boundary_sum_signal, match_positions,
                                  window_nonoverlap_counts)

    cases = [("CCCTAAA", 5, 100, 6), ("ACTG", 2, 40, 3), ("TTAGGG", 4, 60, 5)]
    for pat, k, wsize, slide in cases:
        kmers = telophrase_kmers(pat, k)
        assert all_aperiodic(kmers), pat
        table = jnp.asarray(pack_kmer_table(kmers))
        L = 1300
        seqs = [_telomere_like(rng, pat, 500, L),
                _random_seq(rng, L, n_prob=0.04),
                _random_seq(rng, L // 2) + "\x00" * (L - L // 2)]
        enc = np.stack([encode_ascii(s.encode("latin1")) for s in seqs])
        W = (L - wsize) // slide + 1
        got = boundary_sum_signal(jnp.asarray(enc), table, k, wsize, slide, W)
        m = match_positions(jnp.asarray(enc), table, k)
        counts = window_nonoverlap_counts(m, k, wsize, slide, W, strategy="offset")
        want = np.maximum(np.asarray(counts), 1).sum(axis=1)
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=pat)


def test_boundary_fused_and_scan_paths_agree_end_to_end(rng):
    """Whole step-2 (boundary + changepoint) agrees between the fused
    sum path and the phase scan on both wire formats."""
    kmers = telophrase_kmers("CCCTAAA", 5)
    m_sum = TelomereScanModel(kmers, window_size=100, slide=6)
    m_scan = TelomereScanModel(kmers, window_size=100, slide=6,
                               window_strategy="phase",
                               greedy_strategy="chunked")
    assert m_sum.window_strategy == "sum"
    seqs = [_telomere_like(rng, "CCCTAAA", 800, 2400),
            _telomere_like(rng, "CCCTAAA", 1200, 2400),
            _random_seq(rng, 2400, n_prob=0.01),
            _random_seq(rng, 900)]
    codes = [batch.encode_read(s) for s in seqs]
    tails = [batch.extract_tail(c, "forward", 100, 2400) for c in codes]
    tcodes, lens = batch.tails_batch(tails, max(len(t) for t in tails))
    nw = batch.window_counts_for_lengths(lens, 100, 6)
    for use_lens in (None, lens):
        t_a, h_a = m_sum.step2_boundary(tcodes, nw, use_lens)
        t_b, h_b = m_scan.step2_boundary(tcodes, nw, use_lens)
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))
        np.testing.assert_array_equal(np.asarray(h_a), np.asarray(h_b))


def test_model_routes_sum_for_aperiodic_table():
    m = TelomereScanModel(telophrase_kmers("CCCTAAA", 5))
    assert m.aperiodic
    assert m.window_strategy == "sum"
    assert m.greedy_strategy == "sum"


def test_model_falls_back_for_periodic_table():
    # 'AC' at k=3 yields ACA/CAC (period 2) — sum would over-count
    kmers = telophrase_kmers("AC", 3)
    assert not all_aperiodic(kmers)
    m = TelomereScanModel(kmers)
    assert m.window_strategy == "phase"
    assert m.greedy_strategy == "chunked"
    # an explicit/env 'sum' request degrades with a warning, not silence
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m2 = TelomereScanModel(kmers, window_strategy="sum",
                               greedy_strategy="sum")
    assert m2.window_strategy == "phase" and m2.greedy_strategy == "chunked"
    assert sum("aperiodic" in str(x.message) for x in w) == 2


def test_periodic_table_counts_stay_exact(rng):
    """The fallback path still reproduces finditer semantics where the
    sum would genuinely differ: 'ACACAC...' under ACA/CAC."""
    kmers = telophrase_kmers("AC", 3)
    model = TelomereScanModel(kmers)
    seqs = ["AC" * 500, _random_seq(rng, 1000, "AC"), _random_seq(rng, 1000)]
    codes = [batch.encode_read(s) for s in seqs]
    counts = model.step1_counts(batch.ends_batch(codes, 1000))
    for i, s in enumerate(seqs):
        for j, km in enumerate(kmers):
            assert counts[i, 0, j] == count_nonoverlapping(s[:1000], km), (i, km)


def test_default_model_window_counts_match_oracle(rng):
    """End-to-end: the default (sum-routed) model's raw window counts
    equal finditer counts on each window's windowSize-1-char substring
    (the verified off-by-one, allsteps.py:221-224)."""
    wsize, slide = 100, 6
    kmers = telophrase_kmers("CCCTAAA", 5)
    model = TelomereScanModel(kmers, window_size=wsize, slide=slide)
    assert model.window_strategy == "sum"
    L = 2600
    seqs = [_telomere_like(rng, "CCCTAAA", 900, L),
            _random_seq(rng, L, n_prob=0.02)]
    codes = [batch.encode_read(s) for s in seqs]
    tcodes, _ = batch.tails_batch(codes, L)
    raw = model.rawcounts(tcodes)
    W = (L - wsize) // slide + 1
    for i, s in enumerate(seqs):
        for w in range(W):
            sub = s[w * slide : w * slide + wsize - 1]
            for j, km in enumerate(kmers):
                assert raw[i, j, w] == count_nonoverlapping(sub, km), (i, w, km)


def test_model_routes_split_for_mixed_table():
    """Human CCCTAA k=5: 2 of 12 entries self-overlap — the model
    splits, with the subsets indexing the original (sorted) order."""
    kmers = telophrase_kmers("CCCTAA", 5)
    m = TelomereScanModel(kmers)
    assert not m.aperiodic
    assert m.window_strategy == "split"
    assert m.greedy_strategy == "split"
    idx_a, idx_p = m._split_idx
    assert len(idx_a) == 10 and len(idx_p) == 2
    assert sorted(kmers[i] for i in idx_p) == ["CTAAC", "GATTG"]
    # forcing 'sum' on a mixed table degrades to 'split', loudly
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m2 = TelomereScanModel(kmers, window_strategy="sum",
                               greedy_strategy="sum")
    assert m2.window_strategy == "split" and m2.greedy_strategy == "split"
    assert sum("aperiodic" in str(x.message) for x in w) == 2
    # 'split' requested on homogeneous tables degenerates sensibly
    m3 = TelomereScanModel(telophrase_kmers("CCCTAAA", 5),
                           window_strategy="split", greedy_strategy="split")
    assert m3.window_strategy == "sum" and m3.greedy_strategy == "sum"


def test_split_matches_phase_and_oracle(rng):
    """Mixed-table split vs forced whole-table phase scan: step-1
    counts, per-K window counts, and boundaries must be bit-identical,
    and both must match finditer semantics — including on adversarial
    periodic-run sequences where greedy genuinely blocks ('CTAAC'
    chains at spacing 4)."""
    wsize, slide = 100, 6
    kmers = telophrase_kmers("CCCTAA", 5)
    split_m = TelomereScanModel(kmers, window_size=wsize, slide=slide)
    phase_m = TelomereScanModel(kmers, window_size=wsize, slide=slide,
                                window_strategy="phase",
                                greedy_strategy="chunked")
    assert split_m.window_strategy == "split"
    L = 2600
    # CTAAC has period 4: "CTAA"*n hosts matches every 4 bp, the exact
    # self-overlap case the aperiodic identity cannot handle
    seqs = [
        "CTAA" * (L // 4),
        _telomere_like(rng, "CCCTAA", 900, L),
        _random_seq(rng, L, n_prob=0.02),
        ("CTAA" * 30 + _random_seq(rng, 200))[:L].ljust(L, "A"),
    ]
    codes = [batch.encode_read(s) for s in seqs]

    ends = batch.ends_batch(codes, 1000)
    c_split = split_m.step1_counts(ends)
    c_phase = phase_m.step1_counts(ends)
    np.testing.assert_array_equal(c_split, c_phase)
    for i, s in enumerate(seqs):
        for j, km in enumerate(kmers):
            assert c_split[i, 0, j] == count_nonoverlapping(s[:1000], km), \
                (i, km)

    tcodes, lens = batch.tails_batch(codes, L)
    raw_split = split_m.rawcounts(tcodes)
    raw_phase = phase_m.rawcounts(tcodes)
    np.testing.assert_array_equal(raw_split, raw_phase)
    W = (L - wsize) // slide + 1
    for i, s in (0, seqs[0]), (3, seqs[3]):      # the adversarial rows
        for w in range(0, W, 7):
            sub = s[w * slide : w * slide + wsize - 1]
            for j, km in enumerate(kmers):
                assert raw_split[i, j, w] == count_nonoverlapping(sub, km), \
                    (i, w, km)

    nw = batch.window_counts_for_lengths(lens, wsize, slide)
    t_s, h_s = split_m.step2_boundary(tcodes, nw, lens)
    t_p, h_p = phase_m.step2_boundary(tcodes, nw, lens)
    np.testing.assert_array_equal(t_s, t_p)
    np.testing.assert_array_equal(h_s, h_p)


def test_oversized_aperiodic_subset_keeps_whole_table_scan(rng):
    """>31 aperiodic entries + a periodic one: the split WINDOW path
    would exceed boundary_sum_signal's 31-entry presence plane, so the
    model must keep the whole-table scan there (greedy split has no
    such cap) — and still run (this crashed before the guard)."""
    import itertools

    aper = []
    for t in itertools.product("ACGT", repeat=6):
        w = "".join(t)
        if smallest_period(w) == 6:
            aper.append(w)
        if len(aper) == 33:
            break
    kms = aper + ["CAAAAC"]          # periodic (period 5)
    assert smallest_period("CAAAAC") == 5
    m = TelomereScanModel(kms)
    assert m.window_strategy == "phase"
    assert m.greedy_strategy == "split"
    codes = [batch.encode_read(_random_seq(rng, 600))]
    tcodes, lens = batch.tails_batch(codes, 600)
    nw = batch.window_counts_for_lengths(lens, 100, 7)
    t, has = m.step2_boundary(tcodes, nw, lens)      # must not raise
    c = m.step1_counts(batch.ends_batch(codes, 300))
    assert c.shape == (1, 2, 34)
