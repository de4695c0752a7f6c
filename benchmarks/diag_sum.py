"""One-off: scan-free 'sum' strategy vs the 'phase' scan on chip —
step-2 only and the full two-stage chain, chained-loop slope,
D2H-synced. Records go to BASELINE.md."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
from topsicle_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax, jax.numpy as jnp
from topsicle_tpu.io import batch as batching
from topsicle_tpu.kmers import telophrase_kmers
from topsicle_tpu.models import TelomereScanModel
from topsicle_tpu.models.telomere import (_step1_counts_lean,
                                          _step2_boundary_lean)
from bench import make_reads

model = TelomereScanModel(telophrase_kmers("CCCTAAA", 5), window_size=100, slide=6)
print(f"model default strategies: window={model.window_strategy}, "
      f"greedy={model.greedy_strategy}", flush=True)
B, no_bp, mlt = 128, 1000, 20000
k = 5
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


def step2_chain(strategy):
    def f(px, lens1d, nw, table, iters):
        def body(i, acc):
            x = jnp.uint8(i & 1)
            t, _ = _step2_boundary_lean(
                px ^ x, lens1d, nw, table, k=k, window_size=100,
                slide=6, jump=5, min_size=2, strategy=strategy)
            return acc + jnp.sum(t) + i
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
    return jax.jit(f), (jnp.asarray(px), jnp.asarray(lens.astype(np.int32)),
                        jnp.asarray(nw), model.table)


def full_chain(strategy, greedy):
    def f(ep, el, px, lens1d, nw, table, iters):
        def body(i, acc):
            x = jnp.uint8(i & 1)
            c = _step1_counts_lean(ep ^ x, el, table, k=k, greedy=greedy)
            t, _ = _step2_boundary_lean(
                px ^ x, lens1d, nw, table, k=k, window_size=100,
                slide=6, jump=5, min_size=2, strategy=strategy)
            return acc + jnp.sum(c) + jnp.sum(t) + i
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
    return jax.jit(f), (jnp.asarray(ep), jnp.asarray(el), jnp.asarray(px),
                        jnp.asarray(lens.astype(np.int32)), jnp.asarray(nw),
                        model.table)


def measure(tag, c, args, bp, short=4, long=516):
    """Chained-loop slope; the 512-iter spread keeps the signal above
    tunnel timing noise even at ~0.3 ms/iter (a 64-iter spread went
    below the noise floor once the fused path landed)."""
    t0 = time.time(); np.asarray(c(*args, jnp.int32(1)))
    print(f"[{tag}] first: {time.time()-t0:.1f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.time(); np.asarray(c(*args, jnp.int32(short))); ds = time.time()-t0
        t0 = time.time(); np.asarray(c(*args, jnp.int32(long))); dl = time.time()-t0
        per = (dl-ds)/(long-short)
        best = per if best is None else min(best, per)
    print(f"[{tag}] {best*1e3:.2f} ms/iter = {bp/best/1e6:.0f} Mbp/s", flush=True)


def signal_only_chain():
    """The fused y_int alone (no changepoint) — isolates the binseg
    tournament's share of the step-2 budget."""
    from topsicle_tpu.ops import boundary_sum_signal, unpack_codes_len

    W = (Lpad - 100) // 6 + 1

    def f(px, lens1d, nw, table, iters):
        def body(i, acc):
            x = jnp.uint8(i & 1)
            codes = unpack_codes_len(px ^ x, lens1d, Lpad)
            y = boundary_sum_signal(codes, table, k, 100, 6, W)
            return acc + jnp.sum(y) + i
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
    return jax.jit(f), (jnp.asarray(px), jnp.asarray(lens.astype(np.int32)),
                        jnp.asarray(nw), model.table)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "full"):
    c, a = full_chain("sum", "sum")
    measure("full-chain sum", c, a, B * (2 * no_bp + Lpad))
if which in ("all", "step2"):
    for s in ("sum", "phase"):
        c, a = step2_chain(s)
        measure(f"step2 {s}", c, a, B * Lpad)
if which in ("all", "signal"):
    c, a = signal_only_chain()
    measure("step2 signal-only (no binseg)", c, a, B * Lpad)
