"""Round-5 diagnostic: the fused Pallas SUM-signal kernel vs the XLA
sum formulation, same session, chained-loop slope, D2H-synced.

Probes (select via argv: signal | chain | all):
  - xla-signal:    unpack + boundary_sum_signal alone (no binseg)
  - pallas-signal: step2_sum_signal_pallas_lean alone (no binseg)
  - pallas-chain:  step1 (XLA sum) + Pallas sum step2 + tournament
Grid knobs come from TOPSICLE_PALLAS_R / TOPSICLE_PALLAS_WB (read at
import by ops.pallas_kernels); run one config per process — results go
to BASELINE.md's per-strategy table.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from topsicle_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from topsicle_tpu.io import batch as batching  # noqa: E402
from topsicle_tpu.kmers import telophrase_kmers  # noqa: E402
from topsicle_tpu.models import TelomereScanModel  # noqa: E402
from topsicle_tpu.models.telomere import (_step1_counts_lean,  # noqa: E402
                                          _step2_boundary_pallas_lean)
from topsicle_tpu.ops.pallas_kernels import (  # noqa: E402
    _BLOCK_WINDOWS, _READS_PER_PROGRAM, step2_sum_signal_pallas_lean)
from bench import make_reads  # noqa: E402

model = TelomereScanModel(telophrase_kmers("CCCTAAA", 5),
                          window_size=100, slide=6)
B, no_bp, mlt = 128, 1000, 20000
k, K = 5, 14
rng = np.random.default_rng(42)
reads = make_reads(rng, B, mlt)
ends = np.stack([np.concatenate([r[:no_bp], r[-no_bp:][::-1]]) for r in reads])
ep = batching.pack_codes(ends.reshape(B * 2, no_bp)).reshape(B, 2, -1)
el = np.full(B, no_bp, np.int32)
tails = [batching.extract_tail(r, "forward", 100, mlt) for r in reads]
tc, lens = batching.tails_batch(tails, mlt - 100)
Lpad = tc.shape[1]
nw = batching.window_counts_for_lengths(lens, 100, 6).astype(np.int32)
px = batching.pack_codes(tc)
pp = batching.pack_tails_phase_planar_lean(tc, k, 100, 6)
lens2d = lens.astype(np.int32).reshape(-1, 1)
print(f"R={_READS_PER_PROGRAM} WB={_BLOCK_WINDOWS} "
      f"wire={pp.shape} (vs lean {px.shape})", flush=True)


def measure(tag, c, args, bp, short=4, long=516):
    t0 = time.time(); np.asarray(c(*args, jnp.int32(1)))
    print(f"[{tag}] first: {time.time()-t0:.1f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.time(); np.asarray(c(*args, jnp.int32(short))); ds = time.time()-t0
        t0 = time.time(); np.asarray(c(*args, jnp.int32(long))); dl = time.time()-t0
        per = (dl-ds)/(long-short)
        best = per if best is None else min(best, per)
    print(f"[{tag}] {best*1e3:.3f} ms/iter = {bp/best/1e6:.0f} Mbp/s", flush=True)
    return best


def xla_signal_chain():
    from topsicle_tpu.ops import boundary_sum_signal, unpack_codes_len

    W = (Lpad - 100) // 6 + 1

    def f(px, lens1d, table, iters):
        def body(i, acc):
            x = jnp.uint8(i & 1)
            codes = unpack_codes_len(px ^ x, lens1d, Lpad)
            y = boundary_sum_signal(codes, table, k, 100, 6, W)
            return acc + jnp.sum(y) + i
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
    return jax.jit(f), (jnp.asarray(px), jnp.asarray(lens.astype(np.int32)),
                        model.table)


def pallas_signal_chain():
    def f(pp, lens2d, table, iters):
        def body(i, acc):
            x = jnp.uint8(i & 1)
            y = step2_sum_signal_pallas_lean(
                pp ^ x, lens2d, table, k=k, K=K, window_size=100, slide=6,
                L=Lpad)
            return acc + jnp.sum(y) + i
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
    return jax.jit(f), (jnp.asarray(pp), jnp.asarray(lens2d), model.table)


def pallas_full_chain():
    def f(ep, el, pp, lens2d, nw, table, iters):
        def body(i, acc):
            x = jnp.uint8(i & 1)
            c = _step1_counts_lean(ep ^ x, el, table, k=k, greedy="sum")
            t, _ = _step2_boundary_pallas_lean(
                pp ^ x, lens2d, nw, table, k=k, K=K, window_size=100,
                slide=6, L=Lpad, jump=5, min_size=2, mode="sum")
            return acc + jnp.sum(c) + jnp.sum(t) + i
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
    return jax.jit(f), (jnp.asarray(ep), jnp.asarray(el), jnp.asarray(pp),
                        jnp.asarray(lens2d), jnp.asarray(nw), model.table)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "signal"):
    c, a = pallas_signal_chain()
    measure("pallas-signal", c, a, B * Lpad)
    c, a = xla_signal_chain()
    measure("xla-signal", c, a, B * Lpad)
if which in ("all", "chain"):
    c, a = pallas_full_chain()
    measure("pallas-chain", c, a, B * (2 * no_bp + Lpad))
