"""Time step1 resident on the real chip (diagnostics only)."""
import sys, time
import numpy as np
import jax

from topsicle_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from topsicle_tpu.io import batch as batching
from topsicle_tpu.kmers import telophrase_kmers
from topsicle_tpu.models import TelomereScanModel
from bench import make_reads

rng = np.random.default_rng(42)
B, no_bp = 128, 1000
model = TelomereScanModel(telophrase_kmers("CCCTAAA", 5), window_size=100, slide=6)
reads = make_reads(rng, B, 20000)
ends = np.stack([np.concatenate([r[:no_bp], r[-no_bp:][::-1]]) for r in reads])
ep, em = batching.pack_batch(ends.reshape(B * 2, no_bp))
dep = jax.device_put(ep.reshape(B, 2, -1)); dem = jax.device_put(em.reshape(B, 2, -1))
t0 = time.perf_counter()
out = model._step1(dep, dem, model.table)
jax.block_until_ready(out)
print(f"[s1] compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
for trial in range(3):
    t0 = time.perf_counter()
    outs = [model._step1(dep, dem, model.table) for _ in range(20)]
    jax.block_until_ready(outs)
    print(f"[s1] resident: {(time.perf_counter()-t0)/20*1e3:.2f} ms/iter", file=sys.stderr)
# sanity vs counts from numpy oracle on one row
print("counts[0]:", np.asarray(out)[0], file=sys.stderr)
