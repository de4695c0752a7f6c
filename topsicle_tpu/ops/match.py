"""k-mer matching and greedy non-overlap counting on device.

TPU-first design (not a translation of the reference's regex loops —
allsteps.py:181-187,279-291):

- bases are small integer codes; a k-mer becomes one base-4 "rolling
  code", so matching is `k` shifted adds once per position, then one
  integer compare per table entry (VPU-friendly, no string ops);
- `re.finditer`'s non-overlapping semantics are reproduced exactly with
  integer jump chains: `next_match` tables from a reverse cumulative
  min, then either pointer-doubling (whole-end counts, O(log) rounds)
  or bounded hop iteration (per-window counts, <= (window-1)//k rounds);
- everything is batched [B, ...] and int32; no floats anywhere.

Padding convention: invalid bases (N, gaps, padding) carry code >= 4 and
poison every k-mer window that touches them, so per-read ragged lengths
need no explicit masks.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Sentinel for "no further match"; must stay well below int32 overflow
# even after adding k.
_BIG = jnp.int32(1 << 30)

MAX_ROLLING_K = 15  # 4**15 < 2**31; longer k-mers would overflow int32


def rolling_codes(codes: jax.Array, k: int):
    """[..., L] uint8 base codes -> ([..., L-k+1] int32 rolling codes,
    [..., L-k+1] bool validity).

    code(p) = sum_j base[p+j] * 4**j; invalid wherever any base >= 4.
    """
    if k > MAX_ROLLING_K:
        raise ValueError(f"k={k} exceeds rolling-code capacity ({MAX_ROLLING_K})")
    L = codes.shape[-1]
    Lp = L - k + 1
    if Lp <= 0:
        raise ValueError(f"sequence length {L} shorter than k={k}")
    c = codes.astype(jnp.int32)
    val = jnp.zeros(codes.shape[:-1] + (Lp,), jnp.int32)
    bad = jnp.zeros(codes.shape[:-1] + (Lp,), bool)
    for j in range(k):
        sl = jax.lax.slice_in_dim(c, j, j + Lp, axis=-1)
        val = val + sl * (4**j)
        bad = bad | (sl >= 4)
    return val, ~bad


def match_positions(codes: jax.Array, table: jax.Array, k: int) -> jax.Array:
    """[B, L] codes x [K] packed k-mer table -> [B, K, L-k+1] match bits.

    Table entries of -1 (k-mers not expressible as rolling codes, i.e.
    containing non-ACGT characters) never match — a documented deviation
    from the reference's literal regex for non-ACGT *patterns*."""
    val, ok = rolling_codes(codes, k)
    # [B, 1, Lp] == [K, 1] -> [B, K, Lp]
    eq = val[..., None, :] == table.astype(jnp.int32)[:, None]
    return eq & ok[..., None, :]


def next_match_table(match: jax.Array) -> jax.Array:
    """[B, K, Lp] match bits -> [B, K, Lp+1] next-match-at-or-after table
    (values are positions, or >= _BIG when none).  Column Lp is the
    always-empty sentinel slot hop iteration parks dead pointers on."""
    Lp = match.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, match.shape, len(match.shape) - 1)
    cand = jnp.where(match, idx, _BIG)
    nxt = jax.lax.cummin(cand, axis=len(match.shape) - 1, reverse=True)
    pad = jnp.full(match.shape[:-1] + (1,), _BIG, jnp.int32)
    return jnp.concatenate([nxt, pad], axis=-1)


def greedy_count_full(nxt: jax.Array, k: int) -> jax.Array:
    """Greedy non-overlapping match count over the whole axis, per
    [B, K] row — `len(list(re.finditer(kmer, s)))` semantics.

    Pointer doubling: T[p] = position after consuming the first match at
    or beyond p; C[p] = matches consumed.  log2(ceil(Lp/k))+1 rounds of
    composition give the count from position 0."""
    Lp = nxt.shape[-1] - 1
    has = nxt < Lp  # a usable match exists at/after p (sentinel col: False)
    T = jnp.where(has, jnp.minimum(nxt + k, Lp), Lp).astype(jnp.int32)
    C = has.astype(jnp.int32)
    rounds = max(1, math.ceil(math.log2(max(2, Lp // max(k, 1) + 1))))
    for _ in range(rounds):
        C = C + jnp.take_along_axis(C, T, axis=-1)
        T = jnp.take_along_axis(T, T, axis=-1)
    return C[..., 0]


def window_nonoverlap_counts(
    nxt: jax.Array, k: int, window_size: int, slide: int, num_windows: int
) -> jax.Array:
    """Per-window greedy counts, [B, K, W] int32.

    Window w covers window_size-1 characters starting at w*slide (the
    reference's verified off-by-one, allsteps.py:221-224), so admissible
    match starts are w*slide .. w*slide + window_size-1-k.  The greedy
    chain restarts at every window start; at most (window_size-1)//k
    matches fit, which bounds the hop iteration statically."""
    B, K, Lp1 = nxt.shape
    Lp = Lp1 - 1
    starts = jnp.arange(num_windows, dtype=jnp.int32) * slide         # [W]
    limits = starts + (window_size - 1) - k                            # [W]
    hops = max(0, (window_size - 1) // max(k, 1))
    p = jnp.minimum(jnp.broadcast_to(starts, (B, K, num_windows)), Lp)
    cnt = jnp.zeros((B, K, num_windows), jnp.int32)
    for _ in range(hops):
        m = jnp.take_along_axis(nxt, p, axis=-1)
        ok = m <= limits
        cnt = cnt + ok.astype(jnp.int32)
        p = jnp.where(ok, jnp.minimum(m + k, Lp), Lp)
    return cnt
