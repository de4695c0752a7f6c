"""Pallas TPU kernel: fused step-2 window-signal computation.

One kernel fuses, per read, everything between the packed wire format
and the integer window signal the changepoint consumes:

  unpack 2-bit codes -> per-phase rolling k-mer codes -> match bits vs
  the table -> per-window greedy non-overlap counts -> or-1 floor
  -> y_int[w] = sum_K max(count, 1)

so the [K, positions] match plane lives only in VMEM — it never
round-trips HBM as it does in the XLA pipeline (ops/match.py).  Grid is
(reads / _READS_PER_PROGRAM, window blocks).

Exactness contract is identical to ops.match (property-tested against
it and the oracle): reproduces the reference's windowed non-overlapping
`re.finditer` counts with the windowSize-1 off-by-one
(allsteps.py:221-224,279-291 in /root/reference).

MOSAIC-FRIENDLY LAYOUT (the whole trick).  Naive formulations hit four
lowerability walls on the current libtpu toolchain, all found
empirically (each was the next error in line):

  1. tpu.reshape vector<8x2048x4xi32> -> vector<8x8192xi32> — the 2-bit
     unpack interleave (minor-dim merge): unsupported shape cast.
  2. tpu.reshape vector<112x8196xi32> -> vector<112x1366x6xi32> — window
     re-blocking (minor-dim split): unsupported shape cast.  Ditto the
     [R, K, nq] -> [R*K, nq] collapse for int8.
  3. Dynamic lane offsets: value-level dynamic_slice doesn't exist in
     Mosaic, and ref loads at a dynamic lane offset must be 128-aligned.
  4. i1 (bool) vectors with broadcast/replicated layouts — the selects
     in a jnp.where scan body — fail relayout; tpu.dynamic_rotate only
     handles 32-bit element types.

The design that avoids all four: the HOST ships each *window block* of
the tail as its own phase-planar, planarly-2-bit-packed segment
(io/batch.pack_tails_phase_planar):

  - base codes are decimated into `slide` phase planes (plane r holds
    positions r, r+slide, ...);
  - per window block of WB windows, the bq consecutive plane entries the
    block's windows touch (WB plus the scan look-ahead halo, ~2%
    redundancy) are gathered plane-major into a flat segment of
    Pb = slide*bq codes;
  - each segment is packed PLANARLY (bit-pair s of word w is flat
    position s*(Pb/4)+w), invalid flags likewise (bit s of byte b is
    flat position s*(Pb/8)+b).

On device, per (read-block, window-block) program: the unpack is
shift+mask+concatenate along lanes (1), each phase plane is a contiguous
lane slice, per-phase rolling codes are contiguous slices of statically
chosen neighbor planes (2), and the greedy offset scan is a fori_loop
over q0 whose per-step plane access is the STATIC lane slice [0, WB) of
match planes that ride the loop carry and rotate one entry per step
(3; lane rotate is a native op, planes are int32 for 4).  The scan body
is pure integer arithmetic — gates via clip, select via a*(b-c) — so no
i1 vectors exist (4).  This mirrors the XLA phase-scan strategy
(ops/match._window_counts_phase_scan) but fuses the whole chain in
VMEM, and the window-block grid keeps VMEM and compiled-body size
CONSTANT in read length.

VMEM per program at the shipped WB=1920 (demo geometry k=5, K=14,
slide=6): match planes slide x [8, K, WB+16] int32 ~ 5.2 MB, greedy
carries 2 x [8, K, WB] int32 ~ 1.7 MB, unpacked codes [8, slide*bq
~ 12288] int32 ~ 0.4 MB — ~7.4 MB total, comfortably inside a v5e
core's VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os as _os

# Grid tuning knobs (env-overridable for chip sweeps; defaults are the
# shipped values).  R is the read-block height (sublane tiling wants a
# multiple of 8); WB the windows per block (multi-block grids need a
# multiple of 128).  Both change the wire format via
# phase_plane_geometry, which host packer and kernel share — and the
# lowered program text, so the AOT cache invalidates automatically.
_READS_PER_PROGRAM = int(_os.environ.get("TOPSICLE_PALLAS_R", "8"))
_BLOCK_WINDOWS = int(_os.environ.get("TOPSICLE_PALLAS_WB", "1920"))
# Sum-kernel read-block height.  Chip sweep (2026-08-21, signal-only,
# B=128 x 20 kbp, same-session XLA 0.218-0.222 ms/iter): R=8 -> 0.148,
# R=16 -> 0.094, R=32 -> 0.077, R=64 -> 0.066 ms/iter; R=128 OOMs
# scoped VMEM (20.56M > 16M).  WB=3456 (single window block) measured
# WORSE at every R (0.113 at R=32).  Auto-clamped per batch to a
# divisor of B (halving keeps it a multiple of 8).
_SUM_READS = max(8, (int(_os.environ.get("TOPSICLE_PALLAS_SUM_R", "64"))
                     // 8) * 8)    # sublane tiling wants multiples of 8
# int16 sliding-reduce planes in the sum kernel (compares stay int32 —
# Mosaic/v5e rejects i16 vector compares; see _sum_signal_kernel)
_SUM16 = _os.environ.get("TOPSICLE_PALLAS_SUM16", "1").strip().lower() \
    not in ("", "0", "false", "no")


def _gcd(a, b):
    while b:
        a, b = b, a % b
    return a


def phase_plane_geometry(L: int, k: int, window_size: int, slide: int):
    """Static geometry shared by the host packer and the kernel.

    Returns (J, W, WB, nWB, n_outer, bq):
      J       in-window match-start offsets (window_size - k),
      W       windows over the padded length L,
      WB      windows per block,
      nWB     number of window blocks (ceil(W / WB)),
      n_outer fori_loop trip count (ceil(J / slide)),
      bq      per-block plane length in entries: window w at offset j
              reads plane (j%slide) entry w + j//slide, so a block needs
              WB + n_outer match entries, whose rolling codes read base
              planes up to (slide+k-2)//slide + 1 entries further.

    Alignment: with a single block every BlockSpec equals the full
    array, so bq only honors the planar pack's %8 quantum.  With
    multiple blocks, Pallas requires block last dims divisible by 128:
    WB = _BLOCK_WINDOWS (a 128-multiple) and bq rounds up so both
    Pb/4 and Pb/8 are 128-multiples (slide*bq % 1024 == 0) — a few %
    of wire/VMEM padding.
    """
    J = window_size - k
    W = max(0, (L - window_size) // slide + 1)
    n_outer = (J + slide - 1) // slide
    need = n_outer + (slide + k - 2) // slide + 1    # halo beyond WB
    if W == 0:
        return J, 0, 0, 0, n_outer, 0
    if W <= _BLOCK_WINDOWS:
        WB, nWB = W, 1
        bq = W + need
        while (bq * slide) % 8:
            bq += 1
    else:
        WB = _BLOCK_WINDOWS
        nWB = -(-W // WB)
        m = 1024 // _gcd(slide, 1024)
        bq = -(-(WB + need) // m) * m
    return J, W, WB, nWB, n_outer, bq


def _signal_kernel(packed_ref, invalid_ref, table_ref, out_ref, *,
                   k: int, K: int, slide: int, J: int, WB: int,
                   n_outer: int, bq: int, lean: bool = False,
                   R: int = _READS_PER_PROGRAM):
    nq = WB + n_outer              # match-plane entries this block needs
    packed = packed_ref[...].astype(jnp.int32)         # [R, Pb//4]

    # ---- planar unpack: shift+mask quarters -> lane concat [R, Pb] ----
    codes = jnp.concatenate([(packed >> (2 * s)) & 3 for s in range(4)], axis=1)
    if lean:
        # lean wire: no invalid plane on the wire — suffix invalidity is
        # derived from per-read lengths ([R, 1] int32 ref).  Plane r,
        # entry q covers base position (wb*WB + q)*slide + r; positions
        # >= len are poisoned.  Pure int32 arithmetic (no i1 vectors).
        lens = invalid_ref[...].astype(jnp.int32)      # [R, 1]
        wb = pl.program_id(1)
        base0 = wb * (WB * slide)
        q_iota = jax.lax.broadcasted_iota(jnp.int32, (R, bq), 1)
        planes = []
        for r in range(slide):
            raw = jax.lax.slice(codes, (0, r * bq), (R, (r + 1) * bq))
            pos = base0 + q_iota * slide + r
            bad = jnp.clip(pos - lens + 1, 0, 1)       # 1 iff pos >= len
            planes.append(raw + bad * 4)
    else:
        iv = invalid_ref[...].astype(jnp.int32)        # [R, Pb//8]
        invalid = jnp.concatenate([(iv >> s) & 1 for s in range(8)], axis=1)
        codes = codes + invalid * 4    # invalid -> code >= 4 (poisons k-mers)

        # ---- phase planes of base codes: contiguous lane slices ----
        planes = [
            jax.lax.slice(codes, (0, r * bq), (R, (r + 1) * bq))
            for r in range(slide)
        ]

    # ---- per-phase rolling codes + match planes [R, K, nq] (int32) ----
    # Rolling code at plane entry (r, q) = block position q*slide + r;
    # base j of it lives in plane (r+j)%slide at entry q + (r+j)//slide —
    # static per (r, j), so every read is a contiguous slice.
    table = table_ref[...].reshape(1, K, 1)
    mplanes = []
    for r in range(slide):
        val = jnp.zeros((R, nq), jnp.int32)
        bad = jnp.zeros((R, nq), jnp.int32)
        for j in range(k):
            rr, qq = (r + j) % slide, (r + j) // slide
            sl = jax.lax.slice(planes[rr], (0, qq), (R, qq + nq))
            val = val + sl * (4 ** j)
            bad = bad | (sl >= 4).astype(jnp.int32)
        m = (val.reshape(R, 1, nq) == table) & (bad.reshape(R, 1, nq) == 0)
        mplanes.append(m.astype(jnp.int32))

    # ---- greedy offset scan over the J offsets ----
    def body(q0, carry):
        nf, cnt, planes = carry
        for r in range(slide):
            j = q0 * slide + r
            m = jax.lax.slice(planes[r], (0, 0, 0), (R, K, WB))
            gate = jnp.clip(j - nf + 1, 0, 1)        # 1 iff j >= nf
            gate = gate * jnp.clip(J - j, 0, 1)      # and j < J
            take = m * gate                           # m in {0, 1}
            nf = nf + take * (j + k - nf)
            cnt = cnt + take
        # rotate left one entry (pltpu.roll wants non-negative shifts)
        planes = tuple(pltpu.roll(p, nq - 1, 2) for p in planes)
        return nf, cnt, planes

    nf0 = jnp.zeros((R, K, WB), jnp.int32)
    _, cnt, _ = jax.lax.fori_loop(
        0, n_outer, body, (nf0, nf0, tuple(mplanes))
    )

    # ---- or-1 floor, reduce over K ----
    out_ref[...] = jnp.sum(jnp.maximum(cnt, 1), axis=1)


def _sum_signal_kernel(packed_ref, invalid_ref, table_ref, out_ref, *,
                       k: int, K: int, slide: int, J: int, WB: int,
                       n_outer: int, bq: int, lean: bool = False,
                       R: int = _SUM_READS):
    """Scan-free SUM-signal kernel (round 5): the VMEM-fused analog of
    ops.match.boundary_sum_signal, valid for APERIODIC, duplicate-free
    k-mer tables (greedy == occurrence counting; callers gate,
    models.telomere).

    Identity:  y[w] = sum_i max(c_i, 1)
                    = windowed-SUM(any-match plane)
                      + K - popcount(windowed-OR(presence-bit plane)),
    using that distinct rolling codes make matches mutually exclusive
    per position (any-match == word != 0).  Per phase only TWO [R, nq]
    2D planes exist, and the windowed reduction is log2(~J/slide)
    doubling shift-adds per phase — no fori_loop, no rotate, no
    loop-carried state.

    The v1 formulation of this kernel (3D [R, K, nq] eq tensor,
    per-entry 3D slices, int32 everywhere) measured 0.356-0.577 ms/iter
    on chip vs 0.161-0.221 for the XLA sum path same-session — it was
    VPU-INSTRUCTION-bound, and the 3D sublane extractions plus 32-bit
    lanes capped throughput at ~half of XLA's int16 schedule (grid
    sweeps R=8/32 x WB=1920/3456 moved nothing: not a grid/DMA
    problem).  v2 therefore:
      - stays strictly 2D ([R, nq] planes; no [R, K, nq] tensor);
      - reads table entries as SMEM SCALARS (per-entry broadcast
        compare, no sublane relayout);
      - encodes rolling codes in BASE 5 with invalid bases clipped to
        digit 4: valid table codes contain no digit 4, so invalidity
        needs NO separate bad-plane (base-4 digit aliasing — 4*4^j ==
        4^(j+1) — is what forced v1's bad tracking; base 5 is a proper
        positional system for digits 0..4).  The caller converts the
        table to base 5 (still -1 for non-ACGT entries, which then
        never match, same as every other path);
      - optionally (TOPSICLE_PALLAS_SUM16, default on) runs the
        sliding-reduce planes in int16 — 2x lanes per instruction
        there.  The COMPARE stage must stay int32: Mosaic on v5e
        rejects i16 vector compares outright ("Target does not support
        this comparison", arith.cmpi on vector<8x128x2xi16>, observed
        2026-08-21) — the wall that killed an all-int16 formulation.

    Window w (block-local) at offset j = q*slide + r reads plane r
    entry w + q, so phase r contributes a width-n_r sliding reduction,
    n_r = ceil((J - r)/slide); max source entry WB-1 + n_outer-1
    <= nq-2, within the planes the packer ships (same geometry as the
    greedy kernel).  Shift-left along lanes is slice + zero-concat;
    entries poisoned by the zero fill are all >= WB and never read.

    Exactness contract: bit-identical to boundary_sum_signal /
    _window_counts_sliding_sum on the same padded batch
    (property-tested in interpret mode), which are themselves tested
    against the reference's windowed non-overlapping `re.finditer`
    semantics (allsteps.py:221-224,279-291 in /root/reference)."""
    nq = WB + n_outer
    vdt = jnp.int32                 # compare stage: int32 only (see above)
    # sliding-reduce dtype: int16 halves instruction count when the
    # presence word fits 15 bits (adds/ors on i16 vectors lower fine;
    # only compares do not) AND the accumulated window total fits —
    # S <= J per window (at most one match per admissible offset), so
    # giant --windowSize values (> ~32k) must stay int32
    wdt = jnp.int16 if (K <= 15 and J <= 32767 and _SUM16) else jnp.int32
    packed = packed_ref[...].astype(jnp.int32)            # [R, Pb//4]

    # ---- planar unpack + phase planes, invalid clipped to digit 4 ----
    codes = jnp.concatenate([(packed >> (2 * s)) & 3 for s in range(4)], axis=1)
    if lean:
        lens = invalid_ref[...].astype(jnp.int32)      # [R, 1]
        wb = pl.program_id(1)
        base0 = wb * (WB * slide)
        q_iota = jax.lax.broadcasted_iota(jnp.int32, (R, bq), 1)
        planes = []
        for r in range(slide):
            raw = jax.lax.slice(codes, (0, r * bq), (R, (r + 1) * bq))
            pos = base0 + q_iota * slide + r
            bad = jnp.clip(pos - lens + 1, 0, 1)       # 1 iff pos >= len
            planes.append((raw + bad * 4 - raw * bad).astype(vdt))  # bad->4
    else:
        iv = invalid_ref[...].astype(jnp.int32)        # [R, Pb//8]
        invalid = jnp.concatenate([(iv >> s) & 1 for s in range(8)], axis=1)
        codes = jnp.minimum(codes + invalid * 4, 4)    # invalid -> digit 4
        planes = [
            jax.lax.slice(codes, (0, r * bq), (R, (r + 1) * bq)).astype(vdt)
            for r in range(slide)
        ]

    # ---- per-phase base-5 rolling codes -> any-match + word planes ----
    def shl(x, n, dt):
        """Lanes left by n, zero-filled (length kept): slice + concat."""
        if n == 0:
            return x
        z = jnp.zeros((R, n), dt)
        return jnp.concatenate([jax.lax.slice(x, (0, n), (R, nq)), z], axis=1)

    def swin(x, width, op, dt):
        pows = []
        s = x
        w = 1
        while w <= width:
            pows.append((w, s))
            if w * 2 > width:      # next doubling would go unused
                break
            s = op(s, shl(s, w, dt))
            w *= 2
        total = None
        off = 0
        for w, sw in pows:             # LSB-first binary decomposition
            if width & w:
                part = shl(sw, off, dt)
                total = part if total is None else op(total, part)
                off += w
        return total

    S = None
    O = None
    for r in range(slide):
        n_r = (J - r + slide - 1) // slide if r < J else 0
        if n_r <= 0:
            continue
        val = None
        for j in range(k):
            rr, qq = (r + j) % slide, (r + j) // slide
            sl = jax.lax.slice(planes[rr], (0, qq), (R, qq + nq))
            term = sl * vdt(5 ** j) if j else sl
            val = term if val is None else val + term
        word32 = jnp.zeros((R, nq), jnp.int32)
        for i in range(K):
            eq = val == table_ref[i]                   # SMEM scalar read
            word32 = word32 | jnp.where(eq, jnp.int32(1 << i), jnp.int32(0))
        word = word32.astype(wdt)
        tot = (word32 != 0).astype(wdt)                # distinct codes:
        sr = swin(tot, n_r, jnp.add, wdt)              # <=1 match/position
        orr = swin(word, n_r, jnp.bitwise_or, wdt)
        S = sr if S is None else S + sr
        O = orr if O is None else O | orr

    Sw = jax.lax.slice(S, (0, 0), (R, WB)).astype(jnp.int32)
    Ow = jax.lax.slice(O, (0, 0), (R, WB)).astype(jnp.int32) \
        & jnp.int32((1 << K) - 1)
    # SWAR popcount (K <= 31 bits, value nonnegative): plain shifts/
    # masks/one multiply — no dependence on a population_count lowering
    v = Ow - ((Ow >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    present = (v * jnp.int32(0x01010101)) >> 24   # byte-sum in the top byte
    out_ref[...] = Sw + (K - present)


def _signal_pallas_call(packed, aux, table, *, k, K, window_size, slide, L,
                        interpret, lean, mode="greedy"):
    B = packed.shape[0]
    J, W, WB, nWB, n_outer, bq = phase_plane_geometry(L, k, window_size, slide)
    if W == 0 or J <= 0:
        return jnp.full((B, max(W, 0)), K, jnp.int32)
    Pb = bq * slide
    if packed.shape[1] != nWB * (Pb // 4):
        raise ValueError(
            f"wire shape {packed.shape} does not match phase-planar "
            f"geometry for L={L} (expect [B,{nWB * (Pb // 4)}])"
        )
    if not lean and aux.shape[1] != nWB * (Pb // 8):
        raise ValueError(
            f"invalid-plane shape {aux.shape} does not match geometry "
            f"for L={L} (expect [B,{nWB * (Pb // 8)}])"
        )
    # Read-block height: the sum kernel's 2D planes are cheap enough to
    # run R=64 (measured fastest — header comment); the greedy kernel's
    # [R, K, nq] planes keep R=8.  Clamp by halving to a divisor of B
    # (every halving of a multiple of 8 >= 16 stays a multiple of 8).
    R = _SUM_READS if mode == "sum" else _READS_PER_PROGRAM
    while R > 8 and (B % R or R > B):
        R //= 2
    if R % 8:       # halving an env-overridden 24/40/... can land off-grid
        R = 8
    if B % R:
        raise ValueError(f"pallas step2 requires batch divisible by {R}")
    if mode == "sum" and K > 31:
        raise ValueError("sum-signal kernel holds at most 31 presence bits")
    if mode == "sum" and 5 ** k > 0x7FFFFFFF:   # k >= 14
        raise ValueError("sum-signal kernel's base-5 rolling codes "
                         "overflow int32 for k > 13")

    if mode == "sum":
        # base-5 recode of the rolling-code table (kernel docstring: a
        # proper positional system for digits 0..4 lets digit 4 mark
        # invalid bases with no aliasing and no bad-plane); -1 entries
        # (non-ACGT k-mers) stay -1 and never match.  Traced, [K]-tiny.
        t5 = jnp.zeros_like(table)
        for j in range(k):
            t5 = t5 + ((table >> (2 * j)) & 3) * (5 ** j)
        table = jnp.where(table < 0, jnp.int32(-1), t5)
        table_spec = pl.BlockSpec((K,), lambda i, wb: (0,),
                                  memory_space=pltpu.SMEM)
    else:
        table_spec = pl.BlockSpec((K,), lambda i, wb: (0,),
                                  memory_space=pltpu.VMEM)

    body = _sum_signal_kernel if mode == "sum" else _signal_kernel
    kernel = functools.partial(
        body, k=k, K=K, slide=slide, J=J, WB=WB,
        n_outer=n_outer, bq=bq, lean=lean, R=R,
    )
    aux_spec = (
        pl.BlockSpec((R, 1), lambda i, wb: (i, 0), memory_space=pltpu.VMEM)
        if lean else
        pl.BlockSpec((R, Pb // 8), lambda i, wb: (i, wb),
                     memory_space=pltpu.VMEM)
    )
    # Trace the kernel in 32-bit mode: the kernel is pure int32/uint8,
    # and any x64-widened scalar would hit an infinite recursion in
    # Mosaic's 64-bit convert-element-type lowering.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(B // R, nWB),
            in_specs=[
                pl.BlockSpec((R, Pb // 4), lambda i, wb: (i, wb),
                             memory_space=pltpu.VMEM),
                aux_spec,
                table_spec,
            ],
            out_specs=pl.BlockSpec((R, WB), lambda i, wb: (i, wb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nWB * WB), jnp.int32),
            interpret=interpret,
        )(packed, aux, table)
    return out[:, :W]


@functools.partial(
    jax.jit,
    static_argnames=("k", "K", "window_size", "slide", "L", "interpret"),
)
def step2_signal_pallas(packed, invalid_bits, table, *, k: int, K: int,
                        window_size: int, slide: int, L: int,
                        interpret: bool = False):
    """Phase-planar packed tails -> y_int [B, W] int32 (the or-1 floored
    sum over k-mers per window).

    `packed`/`invalid_bits` must come from io.batch.pack_tails_phase_planar
    with the SAME (k, window_size, slide); `L` is the original padded
    tail length the windows are defined over (W = (L-window)//slide+1,
    matching the XLA path on the same padded batch).
    """
    return _signal_pallas_call(
        packed, invalid_bits, table, k=k, K=K, window_size=window_size,
        slide=slide, L=L, interpret=interpret, lean=False)


@functools.partial(
    jax.jit,
    static_argnames=("k", "K", "window_size", "slide", "L", "interpret"),
)
def step2_signal_pallas_lean(packed, lengths, table, *, k: int, K: int,
                             window_size: int, slide: int, L: int,
                             interpret: bool = False):
    """Lean-wire variant: 2 bits/base only.  `packed` comes from
    io.batch.pack_tails_phase_planar_lean; `lengths` is [B, 1] int32
    valid lengths (suffix padding only — callers must check the batch is
    pure ACGT, as for the other lean wire formats).  The kernel derives
    position>=length invalidity from a per-plane iota, replacing the
    1-bit/base invalid plane — a 1.5x cut in host->device wire bytes on
    the dominant transfer of the pipeline.  Bit-identical to
    step2_signal_pallas on clean batches (tested)."""
    return _signal_pallas_call(
        packed, lengths, table, k=k, K=K, window_size=window_size,
        slide=slide, L=L, interpret=interpret, lean=True)


@functools.partial(
    jax.jit,
    static_argnames=("k", "K", "window_size", "slide", "L", "interpret"),
)
def step2_sum_signal_pallas(packed, invalid_bits, table, *, k: int, K: int,
                            window_size: int, slide: int, L: int,
                            interpret: bool = False):
    """Fused scan-free SUM-signal kernel (see _sum_signal_kernel) on the
    dense phase-planar wire.  EXACT ONLY for aperiodic k-mer tables —
    callers gate on kmers.all_aperiodic (models.telomere does).
    Bit-identical to step2_signal_pallas there (property-tested)."""
    return _signal_pallas_call(
        packed, invalid_bits, table, k=k, K=K, window_size=window_size,
        slide=slide, L=L, interpret=interpret, lean=False, mode="sum")


@functools.partial(
    jax.jit,
    static_argnames=("k", "K", "window_size", "slide", "L", "interpret"),
)
def step2_sum_signal_pallas_lean(packed, lengths, table, *, k: int, K: int,
                                 window_size: int, slide: int, L: int,
                                 interpret: bool = False):
    """Lean-wire (2 bits/base + lengths) variant of
    step2_sum_signal_pallas — the production wire for clean batches."""
    return _signal_pallas_call(
        packed, lengths, table, k=k, K=K, window_size=window_size,
        slide=slide, L=L, interpret=interpret, lean=True, mode="sum")
