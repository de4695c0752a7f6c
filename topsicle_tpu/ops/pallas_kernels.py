"""Pallas TPU kernel: fused step-2 window-signal computation.

One kernel fuses, per read, everything between the packed wire format
and the integer window signal the changepoint consumes:

  unpack 2-bit codes -> rolling k-mer codes -> match bits vs the table
  -> per-window greedy non-overlap counts (offset scan) -> or-1 floor
  -> y_int[w] = sum_K max(count, 1)

so the [K, Lp] match plane lives only in VMEM — it never round-trips
HBM as it does in the XLA pipeline (ops/match.py).  Grid is one program
per read; all intermediates fit comfortably in VMEM
(14 x 20k int32 match plane ~ 1.1 MB, two [K, W] carries ~ 0.4 MB).

Exactness contract is identical to ops.match (property-tested against
it and the oracle); layouts are 2D with the long axis minor (lanes).

STATUS (2026-08-18, libtpu v5e toolchain): interpret-mode exact;
hardware lowering still blocked by a Mosaic shape-cast limitation in
the 2-bit unpack — `tpu.reshape vector<8x2048x4xi32> -> vector<8x8192xi32>`
(minor-dim interleave into lanes) fails infer-vector-layout
(benchmarks/profile_pallas.py reproduces).  The XLA phase-scan strategy
(ops/match.py) runs the same computation at ~7.7 ms for B=128 x 20 kbp
on the chip, which is within ~3x of this kernel's HBM-traffic bound, so
the fused kernel stays opt-in until Mosaic grows the layout cast or the
kernel is restructured to take pre-unpacked codes (which forfeits the
fusion the kernel exists for).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_READS_PER_PROGRAM = 8  # sublane-dim tiling rule: blocks need 8 rows


def _signal_kernel(packed_ref, invalid_ref, table_ref, out_ref, *,
                   k: int, K: int, window_size: int, slide: int,
                   L: int, W: int, J: int, nb: int):
    R = _READS_PER_PROGRAM
    packed = packed_ref[...].astype(jnp.int32)         # [R, L//4]
    iv = invalid_ref[...].astype(jnp.int32)            # [R, L//8]

    # ---- unpack 2-bit codes + invalid mask -> codes [R, L] ----
    cols = [(packed >> (2 * s)) & 3 for s in range(4)]
    codes = jnp.stack(cols, axis=-1).reshape(R, L)
    bits = [(iv >> s) & 1 for s in range(8)]
    invalid = jnp.stack(bits, axis=-1).reshape(R, L)
    codes = jnp.where(invalid > 0, jnp.int32(4), codes)

    # ---- rolling codes + validity [R, Lp] ----
    Lp = L - k + 1
    val = jnp.zeros((R, Lp), jnp.int32)
    bad = jnp.zeros((R, Lp), jnp.int32)
    for j in range(k):
        sl = jax.lax.slice(codes, (0, j), (R, j + Lp))
        val = val + sl * (4 ** j)
        bad = bad | (sl >= 4).astype(jnp.int32)

    # ---- match plane, all reads x k-mers fused: [R*K, Lp] ----
    table = table_ref[...].reshape(1, K, 1)
    match = (
        (val.reshape(R, 1, Lp) == table) & (bad.reshape(R, 1, Lp) == 0)
    ).astype(jnp.int32).reshape(R * K, Lp)

    # ---- re-block positions: [R*K, nb, slide] so the per-offset slice
    # (all windows, offset j) is contiguous ----
    # (jnp.pad recurses infinitely when traced inside a pallas kernel
    # under x64 — concatenate instead)
    pad = nb * slide - Lp
    if pad > 0:
        match = jnp.concatenate(
            [match, jnp.zeros((R * K, pad), jnp.int32)], axis=1
        )
    blocks = match.reshape(R * K, nb, slide)

    # ---- offset scan: greedy restart per window (statically unrolled:
    # Mosaic has no value-level dynamic_slice, and J is small) ----
    nf = jnp.zeros((R * K, W), jnp.int32)
    cnt = jnp.zeros((R * K, W), jnp.int32)
    for j in range(J):
        q, rr = divmod(j, slide)
        m = jax.lax.slice(
            blocks, (0, q, rr), (R * K, q + W, rr + 1)
        )[:, :, 0]
        take = (m > 0) & (j >= nf)
        nf = jnp.where(take, jnp.int32(j + k), nf)
        cnt = cnt + take.astype(jnp.int32)

    # ---- or-1 floor, reduce over K ----
    out_ref[...] = jnp.sum(jnp.maximum(cnt, 1).reshape(R, K, W), axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "K", "window_size", "slide", "interpret"),
)
def step2_signal_pallas(packed, invalid_bits, table, *, k: int, K: int,
                        window_size: int, slide: int, interpret: bool = False):
    """[B, L/4] packed + [B, L/8] mask -> y_int [B, W] int32 (the or-1
    floored sum over k-mers per window)."""
    B, Lq = packed.shape
    L = Lq * 4
    J = window_size - k
    W = max(0, (L - window_size) // slide + 1)
    if W == 0 or J <= 0:
        return jnp.full((B, max(W, 0)), K, jnp.int32)
    nb = W + (J + slide - 1) // slide + 1
    R = _READS_PER_PROGRAM
    if B % R:
        raise ValueError(f"pallas step2 requires batch divisible by {R}")

    kernel = functools.partial(
        _signal_kernel, k=k, K=K, window_size=window_size, slide=slide,
        L=L, W=W, J=J, nb=nb,
    )
    # Trace the kernel in 32-bit mode: the kernel is pure int32/uint8,
    # and any x64-widened scalar would hit an infinite recursion in
    # Mosaic's 64-bit convert-element-type lowering.
    with jax.enable_x64(False):
        return _call(kernel, packed, invalid_bits, table, B=B, Lq=Lq, L=L,
                     W=W, K=K, interpret=interpret)


def _call(kernel, packed, invalid_bits, table, *, B, Lq, L, W, K, interpret):
    R = _READS_PER_PROGRAM
    return pl.pallas_call(
        kernel,
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, Lq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L // 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
        interpret=interpret,
    )(packed, invalid_bits, table)
