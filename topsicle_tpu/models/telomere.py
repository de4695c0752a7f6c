"""The flagship device program: batched telomere scanning.

Two fused, jitted stages mirror the reference pipeline (SURVEY.md §1)
but batched over reads instead of looping per read/regex:

  step1: [B, 2, no_bp] end codes     -> [B, 2, K] greedy k-mer counts
         (TRC selection/cutoff runs on host in f64 — counts are tiny and
         the reference's float semantics are host float64)
  step2: [B, L] tail codes + lengths -> per-read changepoint t and the
         integer window signal (for --rawcountpattern)

Everything is integer; jit caches per (B, L) shape.  Multi-chip: the
same functions are wrapped by parallel.sharding for shard_map data
parallelism over the batch axis.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from topsicle_tpu import ops
from topsicle_tpu.kmers import pack_kmer_table


def _step1_counts(ends_codes, table, *, k: int):
    """[B, 2, no_bp] uint8 -> [B, 2, K] int32 non-overlap counts."""
    B, two, L = ends_codes.shape
    flat = ends_codes.reshape(B * two, L)
    match = ops.match_positions(flat, table, k)
    nxt = ops.next_match_table(match)
    counts = ops.greedy_count_full(nxt, k)          # [B*2, K]
    return counts.reshape(B, two, -1)


def _step2_signal(tail_codes, table, *, k: int, window_size: int, slide: int):
    """[B, L] uint8 tail codes -> per-window counts [B, K, W] int32.

    W is the static window count for length L; ragged reads are handled
    by the caller's per-read n_windows (padding codes are 0xFF, which
    never match, but the or-1 floor means padded windows still carry
    signal K — they are excluded by the candidate mask downstream)."""
    L = tail_codes.shape[-1]
    num_windows = max(0, (L - window_size) // slide + 1)
    match = ops.match_positions(tail_codes, table, k)
    nxt = ops.next_match_table(match)
    return ops.window_nonoverlap_counts(nxt, k, window_size, slide, num_windows)


def _step2_boundary(tail_codes, n_windows, table, *, k: int, window_size: int,
                    slide: int, jump: int, min_size: int):
    counts = _step2_signal(tail_codes, table, k=k, window_size=window_size, slide=slide)
    y_int = jnp.maximum(counts, 1).sum(axis=1)      # [B, W] sum over K
    t, has = ops.binseg_l2_device(y_int, n_windows, jump=jump, min_size=min_size)
    return t, has


class TelomereScanModel:
    """Bound to one k-mer table (pattern x telophrase k); provides the
    jitted device entry points used by the engine, __graft_entry__, and
    the benchmarks."""

    def __init__(self, kmers: Sequence[str], *, window_size: int = 100,
                 slide: int = 7, jump: int = 5, min_size: int = 2):
        if not kmers:
            raise ValueError("empty k-mer table")
        self.kmers = list(kmers)
        self.k = len(kmers[0])
        self.K = len(kmers)
        self.window_size = window_size
        self.slide = slide
        self.jump = jump
        self.min_size = min_size
        self.table = jnp.asarray(pack_kmer_table(self.kmers))

        self._step1 = jax.jit(functools.partial(_step1_counts, k=self.k))
        self._step2 = jax.jit(
            functools.partial(
                _step2_boundary,
                k=self.k,
                window_size=window_size,
                slide=slide,
                jump=jump,
                min_size=min_size,
            )
        )
        self._rawcounts = jax.jit(
            functools.partial(
                _step2_signal, k=self.k, window_size=window_size, slide=slide
            )
        )

    # ---- host-facing API (numpy in / numpy out) --------------------------
    def step1_counts(self, ends_codes: np.ndarray) -> np.ndarray:
        """[B, 2, no_bp] uint8 -> [B, 2, K] int32."""
        return np.asarray(self._step1(jnp.asarray(ends_codes), self.table))

    def step2_boundary(self, tail_codes: np.ndarray, n_windows: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """[B, L] uint8, [B] int32 -> (t [B] int64, has [B] bool)."""
        t, has = self._step2(jnp.asarray(tail_codes), jnp.asarray(n_windows), self.table)
        return np.asarray(t), np.asarray(has)

    def rawcounts(self, tail_codes: np.ndarray) -> np.ndarray:
        """[B, L] uint8 -> [B, K, W] int32 per-window counts (no or-1
        floor — the floor is applied by consumers, matching
        rawCountPattern's `or 1` at allsteps.py:402,408)."""
        return np.asarray(self._rawcounts(jnp.asarray(tail_codes), self.table))

    def num_windows(self, length: int) -> int:
        if length < self.window_size:
            return 0
        return (length - self.window_size) // self.slide + 1
