"""Round-5 decomposition + mixed-table refresh, chained-loop slope.

Probes:
  step1  — the ends scan alone ([B, 2, 1000], greedy 'sum')
  binseg — pallas sum signal + exact changepoint MINUS signal-only
           (reported separately so the subtraction is the reader's)
  split  — the mixed-table production chains (human CCCTAA k=5/6,
           CCCTAAA k=6/7) after the int32-cumsum fix, to refresh
           BASELINE.md's split table (those rows shared the emulated
           int64 cumsum the fix removed)
"""
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
                                          _step2_boundary_lean)
from bench import make_reads  # noqa: E402

B, no_bp, mlt = 128, 1000, 20000
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


def measure(tag, c, args, bp, long=4100):
    t0 = time.time(); np.asarray(c(*args, jnp.int32(1)))
    print(f"[{tag}] first: {time.time()-t0:.1f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.time(); np.asarray(c(*args, jnp.int32(4))); ds = time.time()-t0
        t0 = time.time(); np.asarray(c(*args, jnp.int32(long))); dl = time.time()-t0
        per = (dl-ds)/(long-4)
        best = per if best is None else min(best, per)
    print(f"[{tag}] {best*1e3:.3f} ms/iter = {bp/best/1e6:.0f} Mbp/s",
          flush=True)
    return best


def step1_chain(table, k, greedy, split_idx):
    def f(ep, el, table, iters):
        def body(i, acc):
            x = jnp.uint8(i & 1)
            c = _step1_counts_lean(ep ^ x, el, table, k=k, greedy=greedy,
                                   split_idx=split_idx)
            return acc + jnp.sum(c) + i
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
    return jax.jit(f), (jnp.asarray(ep), jnp.asarray(el), table)


def split_chain(pattern, k):
    model = TelomereScanModel(telophrase_kmers(pattern, k),
                              window_size=100, slide=6)
    print(f"  {pattern} k={k}: K={model.K}, strategy="
          f"{model.window_strategy}", flush=True)

    def f(ep, el, px, lens1d, nw, table, iters):
        def body(i, acc):
            x = jnp.uint8(i & 1)
            c = _step1_counts_lean(ep ^ x, el, table, k=k,
                                   greedy=model.greedy_strategy,
                                   split_idx=model._split_idx)
            t, _ = _step2_boundary_lean(
                px ^ x, lens1d, nw, table, k=k, window_size=100,
                slide=6, jump=5, min_size=2,
                strategy=model.window_strategy,
                split_idx=model._split_idx)
            return acc + jnp.sum(c) + jnp.sum(t) + i
        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))
    return jax.jit(f), (jnp.asarray(ep), jnp.asarray(el), jnp.asarray(px),
                        jnp.asarray(lens.astype(np.int32)), jnp.asarray(nw),
                        model.table)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "step1"):
    m5 = TelomereScanModel(telophrase_kmers("CCCTAAA", 5),
                           window_size=100, slide=6)
    c, a = step1_chain(m5.table, 5, "sum", None)
    measure("step1-only", c, a, B * 2 * no_bp, long=8200)
if which in ("all", "split"):
    for pattern, k in (("CCCTAA", 5), ("CCCTAA", 6), ("CCCTAAA", 6),
                       ("CCCTAAA", 7)):
        c, a = split_chain(pattern, k)
        measure(f"split {pattern} k={k}", c, a, B * (2 * no_bp + Lpad),
                long=2050)
