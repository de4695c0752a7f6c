"""Pallas fused step-2 kernel vs the XLA path (interpret mode on CPU).

The kernel targets TPU Mosaic; on this repo's CI (CPU backend) it runs
through the Pallas interpreter, which checks the full lowering contract
except Mosaic codegen.  The phase-planar wire format + kernel layout
(ops/pallas_kernels.py) is the design that Mosaic can lower on the
current toolchain — it compiles and runs on the real chip
(benchmarks/profile_pallas.py); the chip-side XLA<->Pallas bit-identity
check lives in the verify drive (.claude/skills/verify).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from topsicle_tpu import ops
from topsicle_tpu.io import batch as batching
from topsicle_tpu.kmers import pack_kmer_table, telophrase_kmers

import topsicle_tpu.ops.pallas_kernels as pk
from topsicle_tpu.ops.pallas_kernels import step2_signal_pallas


def _xla_signal(tails: np.ndarray, table, k: int, window_size: int, slide: int):
    B, L = tails.shape
    p, m = batching.pack_batch(tails)
    codes = ops.unpack_codes(jnp.asarray(p), jnp.asarray(m), L)
    match = ops.match_positions(codes, table, k)
    W = (L - window_size) // slide + 1
    cnt = ops.window_nonoverlap_counts(match, k, window_size, slide, W)
    return np.asarray(jnp.maximum(cnt, 1).sum(axis=1))


@pytest.mark.parametrize("seed,L", [(0, 2048), (1, 4096)])
def test_pallas_signal_matches_xla(seed, L):
    rng = np.random.default_rng(seed)
    B = 8
    tails = rng.integers(0, 6, (B, L)).astype(np.uint8)  # incl. invalid
    table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", 5)))

    p, m = batching.pack_tails_phase_planar(tails, 5, 100, 6)
    y = step2_signal_pallas(jnp.asarray(p), jnp.asarray(m), table,
                            k=5, K=14, window_size=100, slide=6, L=L,
                            interpret=True)

    y_ref = _xla_signal(tails, table, 5, 100, 6)
    np.testing.assert_array_equal(np.asarray(y), y_ref)


def test_pallas_signal_multi_block(monkeypatch):
    """Exercise the multi-window-block grid path (nWB > 1) by shrinking
    the block size; geometry + packer must agree via the shared
    phase_plane_geometry."""
    monkeypatch.setattr(pk, "_BLOCK_WINDOWS", 128)
    rng = np.random.default_rng(7)
    B, L = 8, 4096
    k, w, slide = 5, 100, 6
    tails = rng.integers(0, 6, (B, L)).astype(np.uint8)
    table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", k)))
    _, W, WB, nWB, _, _ = pk.phase_plane_geometry(L, k, w, slide)
    assert nWB > 1, "geometry must produce multiple window blocks"

    p, m = batching.pack_tails_phase_planar(tails, k, w, slide)
    y = step2_signal_pallas(jnp.asarray(p), jnp.asarray(m), table,
                            k=k, K=14, window_size=w, slide=slide, L=L,
                            interpret=True)
    y_ref = _xla_signal(tails, table, k, w, slide)
    np.testing.assert_array_equal(np.asarray(y), y_ref)


def test_model_pallas_path_matches_xla():
    """Production wiring: TelomereScanModel(use_pallas=True) must give
    bit-identical (t, has) to the XLA path on ragged batches with
    non-ACGT bases (interpret mode on CPU; Mosaic on chip is covered by
    the verify drive)."""
    from topsicle_tpu.models import TelomereScanModel
    from topsicle_tpu.kmers import telophrase_kmers

    rng = np.random.default_rng(3)
    kmers = telophrase_kmers("CCCTAAA", 5)
    m_pl = TelomereScanModel(kmers, window_size=100, slide=6, use_pallas=True)
    m_xla = TelomereScanModel(kmers, window_size=100, slide=6, use_pallas=False)
    assert m_pl.use_pallas and not m_xla.use_pallas

    B, L = 8, 2048
    codes = rng.integers(0, 5, (B, L)).astype(np.uint8)  # incl. some N
    lens = rng.integers(150, L + 1, B).astype(np.int32)
    for i in range(B):
        codes[i, lens[i]:] = 0xFF
    n_windows = batching.window_counts_for_lengths(lens, 100, 6)

    t1, h1 = m_pl.step2_boundary(codes, n_windows, lens)
    t2, h2 = m_xla.step2_boundary(codes, n_windows, lens)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(h1, h2)

    # batches not divisible by 8 fall back to the XLA path transparently
    t3, h3 = m_pl.step2_boundary(codes[:5], n_windows[:5], lens[:5])
    np.testing.assert_array_equal(t3, t2[:5])
    np.testing.assert_array_equal(h3, h2[:5])


def test_pallas_batch_divisibility():
    table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", 5)))
    tails = np.zeros((3, 2048), np.uint8)
    p, m = batching.pack_tails_phase_planar(tails, 5, 100, 6)
    with pytest.raises(ValueError):
        step2_signal_pallas(jnp.asarray(p), jnp.asarray(m), table,
                            k=5, K=14, window_size=100, slide=6, L=2048,
                            interpret=True)


def test_pallas_wire_shape_mismatch():
    table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", 5)))
    p = jnp.zeros((8, 512), jnp.uint8)
    m = jnp.zeros((8, 256), jnp.uint8)
    with pytest.raises(ValueError):
        step2_signal_pallas(p, m, table, k=5, K=14, window_size=100,
                            slide=6, L=8192, interpret=True)


@pytest.mark.parametrize("seed,L", [(0, 2048), (3, 4096)])
def test_pallas_lean_matches_dense(seed, L):
    """Lean wire (2 bits/base + lengths) == dense phase-planar wire on
    clean batches with ragged suffix padding."""
    from topsicle_tpu.ops.pallas_kernels import step2_signal_pallas_lean

    rng = np.random.default_rng(seed)
    B = 8
    k, w, slide = 5, 100, 6
    lens = rng.integers(300, L + 1, B).astype(np.int32)
    tails = np.full((B, L), 0xFF, np.uint8)
    for i in range(B):
        tails[i, : lens[i]] = rng.integers(0, 4, lens[i])
    table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", k)))

    p, m = batching.pack_tails_phase_planar(tails, k, w, slide)
    y_dense = step2_signal_pallas(jnp.asarray(p), jnp.asarray(m), table,
                                  k=k, K=14, window_size=w, slide=slide,
                                  L=L, interpret=True)
    pl_ = batching.pack_tails_phase_planar_lean(tails, k, w, slide)
    y_lean = step2_signal_pallas_lean(
        jnp.asarray(pl_), jnp.asarray(lens.reshape(-1, 1)), table,
        k=k, K=14, window_size=w, slide=slide, L=L, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_lean), np.asarray(y_dense))
    np.testing.assert_array_equal(np.asarray(y_lean), _xla_signal(tails, table, k, w, slide))


def test_pallas_lean_multi_block(monkeypatch):
    """Lean wire on the multi-window-block grid: per-block position
    iota (base0 = wb*WB*slide) must line up with the packer."""
    from topsicle_tpu.ops.pallas_kernels import step2_signal_pallas_lean

    monkeypatch.setattr(pk, "_BLOCK_WINDOWS", 128)
    rng = np.random.default_rng(9)
    B, L = 8, 4096
    k, w, slide = 5, 100, 6
    lens = rng.integers(1000, L + 1, B).astype(np.int32)
    tails = np.full((B, L), 0xFF, np.uint8)
    for i in range(B):
        tails[i, : lens[i]] = rng.integers(0, 4, lens[i])
    table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", k)))
    pl_ = batching.pack_tails_phase_planar_lean(tails, k, w, slide)
    y = step2_signal_pallas_lean(
        jnp.asarray(pl_), jnp.asarray(lens.reshape(-1, 1)), table,
        k=k, K=14, window_size=w, slide=slide, L=L, interpret=True)
    np.testing.assert_array_equal(np.asarray(y), _xla_signal(tails, table, k, w, slide))


@pytest.mark.parametrize("seed,L", [(0, 2048), (1, 4096)])
def test_pallas_sum_signal_matches_xla(seed, L):
    """The round-5 scan-free sum-signal kernel == the greedy kernel ==
    the XLA path on the (aperiodic) demo table, dirty batches."""
    from topsicle_tpu.ops.pallas_kernels import step2_sum_signal_pallas

    rng = np.random.default_rng(seed)
    B = 8
    tails = rng.integers(0, 6, (B, L)).astype(np.uint8)  # incl. invalid
    table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", 5)))

    p, m = batching.pack_tails_phase_planar(tails, 5, 100, 6)
    y = step2_sum_signal_pallas(jnp.asarray(p), jnp.asarray(m), table,
                                k=5, K=14, window_size=100, slide=6, L=L,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(y),
                                  _xla_signal(tails, table, 5, 100, 6))


def test_pallas_sum_signal_lean_and_multi_block(monkeypatch):
    """Lean wire + nWB > 1 grid for the sum-signal kernel."""
    from topsicle_tpu.ops.pallas_kernels import step2_sum_signal_pallas_lean

    monkeypatch.setattr(pk, "_BLOCK_WINDOWS", 128)
    rng = np.random.default_rng(11)
    B, L = 8, 4096
    k, w, slide = 5, 100, 6
    assert pk.phase_plane_geometry(L, k, w, slide)[3] > 1
    lens = rng.integers(300, L + 1, B).astype(np.int32)
    tails = np.full((B, L), 0xFF, np.uint8)
    for i in range(B):
        tails[i, : lens[i]] = rng.integers(0, 4, lens[i])
    table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", k)))
    pl_ = batching.pack_tails_phase_planar_lean(tails, k, w, slide)
    y = step2_sum_signal_pallas_lean(
        jnp.asarray(pl_), jnp.asarray(lens.reshape(-1, 1)), table,
        k=k, K=14, window_size=w, slide=slide, L=L, interpret=True)
    np.testing.assert_array_equal(np.asarray(y),
                                  _xla_signal(tails, table, k, w, slide))


def test_model_pallas_sum_kind():
    """use_pallas='sum' routes to the sum kernel on aperiodic tables
    (bit-identical t/has to the XLA path) and degrades to 'greedy' on
    tables with periodic entries (where the sum identity is invalid)."""
    from topsicle_tpu.models import TelomereScanModel
    from topsicle_tpu.models.telomere import resolve_pallas_kind

    assert resolve_pallas_kind("sum") == "sum"
    assert resolve_pallas_kind(True) == "greedy"
    assert resolve_pallas_kind(False) is None
    with pytest.raises(ValueError):
        resolve_pallas_kind("bogus")

    rng = np.random.default_rng(5)
    kmers = telophrase_kmers("CCCTAAA", 5)     # fully aperiodic
    m_sum = TelomereScanModel(kmers, window_size=100, slide=6,
                              use_pallas="sum")
    assert m_sum.pallas_kind == "sum" and m_sum.use_pallas
    m_xla = TelomereScanModel(kmers, window_size=100, slide=6,
                              use_pallas=False)

    B, L = 8, 2048
    codes = rng.integers(0, 5, (B, L)).astype(np.uint8)   # incl. some N
    lens = rng.integers(150, L + 1, B).astype(np.int32)
    for i in range(B):
        codes[i, lens[i]:] = 0xFF
    nw = batching.window_counts_for_lengths(lens, 100, 6)
    t1, h1 = m_sum.step2_boundary(codes, nw, lens)        # dense wire
    t2, h2 = m_xla.step2_boundary(codes, nw, lens)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(h1, h2)
    clean = np.where(codes < 4, codes, 0).astype(np.uint8)
    lens_full = np.full(B, L, np.int32)
    nw_full = batching.window_counts_for_lengths(lens_full, 100, 6)
    t3, h3 = m_sum.step2_boundary(clean, nw_full, lens_full)   # lean wire
    t4, h4 = m_xla.step2_boundary(clean, nw_full, lens_full)
    np.testing.assert_array_equal(t3, t4)
    np.testing.assert_array_equal(h3, h4)

    # mixed table (human CCCTAA k=5 has periodic entries) -> greedy
    with pytest.warns(UserWarning, match="aperiodic"):
        m_mixed = TelomereScanModel(telophrase_kmers("CCCTAA", 5),
                                    window_size=100, slide=6,
                                    use_pallas="sum")
    assert m_mixed.pallas_kind == "greedy"

    # duplicate codes (ATAT k=2: origin {AT, TA} == its complement set,
    # fully aperiodic) break the kernel's any-match == word!=0 identity
    # — must also degrade to greedy (the XLA sum path counts each
    # duplicate entry separately and stays valid)
    with pytest.warns(UserWarning, match="duplicate"):
        m_dup = TelomereScanModel(telophrase_kmers("ATAT", 2),
                                  window_size=100, slide=6,
                                  use_pallas="sum")
    assert m_dup.pallas_kind == "greedy"


@pytest.mark.parametrize("k,w,slide", [
    (4, 64, 3),     # small window, slide < k
    (5, 100, 1),    # slide=1: a single phase plane, n_outer = J
    (6, 80, 7),     # slide > k
    (7, 120, 7),    # 5**7 > int16: the int32 val-plane path
])
def test_pallas_sum_signal_geometry_sweep(k, w, slide):
    """The sum kernel across the geometry space (phase counts, halo
    arithmetic, val dtype selection) — bit-identical to the XLA sum
    signal on dirty batches.  The shipped defaults only exercise
    k=5/w=100/slide=6."""
    from topsicle_tpu.ops.pallas_kernels import step2_sum_signal_pallas

    rng = np.random.default_rng(k * 100 + slide)
    B, L = 8, 1536
    tails = rng.integers(0, 6, (B, L)).astype(np.uint8)
    # synthetic aperiodic-ish table: random distinct k-mers, keep only
    # aperiodic ones (the identity the kernel needs), pad via distinct
    # extras; exactness vs the occurrence-count XLA path holds for ANY
    # table (both count plain occurrences) — aperiodicity only matters
    # for greedy parity, which the XLA sum path itself assumes
    kmers = set()
    while len(kmers) < 10:
        kmers.add("".join(rng.choice(list("ACGT"), k)))
    kmers = sorted(kmers)
    table = jnp.asarray(pack_kmer_table(kmers))
    K = len(kmers)

    p, m = batching.pack_tails_phase_planar(tails, k, w, slide)
    y = step2_sum_signal_pallas(jnp.asarray(p), jnp.asarray(m), table,
                                k=k, K=K, window_size=w, slide=slide, L=L,
                                interpret=True)
    # XLA occurrence-count signal (strategy 'sum')
    pb, mb = batching.pack_batch(tails)
    codes = ops.unpack_codes(jnp.asarray(pb), jnp.asarray(mb), L)
    W = (L - w) // slide + 1
    y_ref = np.asarray(ops.boundary_sum_signal(codes, table, k, w, slide, W))
    np.testing.assert_array_equal(np.asarray(y), y_ref)


def test_model_dispatches_lean_pallas():
    """TelomereScanModel with use_pallas picks the lean wire for clean
    batches and the dense wire when a read carries N — identical t/has."""
    from topsicle_tpu.models import TelomereScanModel

    rng = np.random.default_rng(4)
    B, L = 8, 2048
    model = TelomereScanModel(telophrase_kmers("CCCTAAA", 5),
                              window_size=100, slide=6, use_pallas=True)
    lens = rng.integers(500, L + 1, B).astype(np.int32)
    tails = np.full((B, L), 0xFF, np.uint8)
    for i in range(B):
        tails[i, : lens[i]] = rng.integers(0, 4, lens[i])
    nw = batching.window_counts_for_lengths(lens, 100, 6)
    t_clean, has_clean = model.step2_boundary(tails, nw, lens)   # lean path
    t_noL, has_noL = model.step2_boundary(tails, nw, None)       # dense path
    np.testing.assert_array_equal(t_clean, t_noL)
    np.testing.assert_array_equal(has_clean, has_noL)
