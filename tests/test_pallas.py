"""Pallas fused step-2 kernel vs the XLA path (interpret mode on CPU).

The kernel itself targets TPU; on this repo's CI (CPU backend) it runs
through the Pallas interpreter, which checks the full lowering contract
except Mosaic codegen.  Known Mosaic limitation on the axon toolchain:
the unpack interleave reshape is an unsupported vector shape cast, so
the kernel is experimental/opt-in there (see pallas_kernels.py docs).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from topsicle_tpu import ops
from topsicle_tpu.io import batch as batching
from topsicle_tpu.kmers import pack_kmer_table, telophrase_kmers
from topsicle_tpu.ops.pallas_kernels import step2_signal_pallas


@pytest.mark.parametrize("seed,L", [(0, 2048), (1, 4096)])
def test_pallas_signal_matches_xla(seed, L):
    rng = np.random.default_rng(seed)
    B = 8
    tails = rng.integers(0, 6, (B, L)).astype(np.uint8)  # incl. invalid
    p, m = batching.pack_batch(tails)
    table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", 5)))

    y = step2_signal_pallas(jnp.asarray(p), jnp.asarray(m), table,
                            k=5, K=14, window_size=100, slide=6, interpret=True)

    codes = ops.unpack_codes(jnp.asarray(p), jnp.asarray(m), L)
    match = ops.match_positions(codes, table, 5)
    W = (L - 100) // 6 + 1
    cnt = ops.window_nonoverlap_counts(match, 5, 100, 6, W)
    y_ref = jnp.maximum(cnt, 1).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))


def test_pallas_batch_divisibility():
    table = jnp.asarray(pack_kmer_table(telophrase_kmers("CCCTAAA", 5)))
    p = jnp.zeros((3, 512), jnp.uint8)
    m = jnp.zeros((3, 256), jnp.uint8)
    with pytest.raises(ValueError):
        step2_signal_pallas(p, m, table, k=5, K=14, window_size=100,
                            slide=6, interpret=True)
