"""Pallas TPU kernel: batched shifted-band DUAL-affine DP for long reads.

The long-read extension stage (map-ont / map-hifi; reference equivalent:
src/mm_align.c:48-118 routing into 3rdparty/minimap2/ksw2_extz2_sse.c) as a
TPU program.  Complements align/pallas_sw.py (the sr scoring kernel):

 - band coordinates: DP row i covers ref positions [dlo+i, dhi+i]; storage
   and compute are lq x band (W) instead of lq x ref_len, so ONT-length
   reads stay small.  The host pre-slices the per-row reference windows into
   an [lq, W] int8 matrix (R_band) that streams row-by-row from HBM via the
   grid BlockSpec — no dynamic lane indexing in the kernel;
 - dual affine gap tiers (minimap2 -O q,q2 -E e,e2) as two insertion lanes
   carried across rows plus two in-row prefix-max scans for the deletion
   tiers (the same gap-reopened-from-gap-never-wins identity as the sr
   kernel, one scan per tier);
 - the kernel emits a per-cell DIRECTION byte (H source + per-lane gap
   extension flags) and per-row (max, argmax); the host replays the ksw2
   z-drop rule over the tiny row-stats stream to pick the stop cell and
   walks the direction matrix for the CIGAR — O(path) host work instead of
   the O(lq*W) DP.  Bit-equality with the host oracle
   (align/longread.py::banded_dp_shifted) is asserted by
   tests/test_align_long.py.

Direction byte: bits 0-2 = H source in the host traceback's priority order
(0 stop/zero, 1 diag, 2 E, 3 E2, 4 F, 5 F2); bit 3/4 = E/E2 run continues
left; bit 5/6 = F/F2 run continues up.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 28)
TILE_B = 8
ROWS = 8  # DP rows per grid step (TPU block constraint: dim -2 % 8 == 0)


def _scan_max(x):
    n = x.shape[-1]
    shift = 1
    while shift < n:
        shifted = jnp.pad(x, ((0, 0), (shift, 0)), constant_values=NEG)[:, :n]
        x = jnp.maximum(x, shifted)
        shift *= 2
    return x


def _shift_left(x, fill):
    return jnp.concatenate(
        [x[:, 1:], jnp.full((x.shape[0], 1), fill, x.dtype)], axis=1)


def _shift_right(x, fill):
    return jnp.concatenate(
        [jnp.full((x.shape[0], 1), fill, x.dtype), x[:, :-1]], axis=1)


def _make_kernel(A, B, GO, GE, GO2, GE2):
    def kernel(q_ref, rb_ref, meta_ref, dir_ref, stat_ref,
               h_scr, f_scr, f2_scr):
        ib = pl.program_id(1)
        W = rb_ref.shape[2]
        idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, W), 1)
        dlo = meta_ref[:, 0:1]
        lr = meta_ref[:, 1:2]
        worig = meta_ref[:, 2:3]  # the UN-PADDED band width (dhi - dlo + 1)

        @pl.when(ib == 0)
        def _init():
            h_scr[:] = jnp.zeros((TILE_B, W), jnp.int32)
            f_scr[:] = jnp.full((TILE_B, W), NEG, jnp.int32)
            f2_scr[:] = jnp.full((TILE_B, W), NEG, jnp.int32)

        # ROWS sequential DP rows per grid step (unrolled; the row recurrence
        # is inherently serial — the batch and band lanes are the parallelism)
        for r in range(ROWS):
            i = ib * ROWS + r
            h_prev = h_scr[:]
            f_prev = f_scr[:]
            f2_prev = f2_scr[:]

            j = idx + dlo + (i + 1)  # 1-based ref column of band cell
            # columns beyond the caller's band (W is padded to 128) must
            # stay out of band — the host oracle's band is exactly worig
            # wide, and a wider band explores different diagonals
            inb = (j >= 1) & (j <= lr) & (idx < worig)
            sel = (jax.lax.broadcasted_iota(
                jnp.int32, (q_ref.shape[1], 1), 0) == i).astype(jnp.float32)
            qc = jax.lax.dot_general(q_ref[:], sel, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            qc = qc.astype(jnp.int32)
            rj = rb_ref[:, r, :].astype(jnp.int32)
            sub = jnp.where((rj == qc) & (qc < 4), A, -B)

            diag = h_prev + sub
            f_row = jnp.maximum(_shift_left(h_prev, NEG) - GO,
                                _shift_left(f_prev, NEG) - GE)
            f2_row = jnp.maximum(_shift_left(h_prev, NEG) - GO2,
                                 _shift_left(f2_prev, NEG) - GE2)
            base = jnp.maximum(jnp.maximum(diag,
                                           jnp.maximum(f_row, f2_row)), 0)
            base = jnp.where(inb, base, NEG)
            pm = _scan_max(base + idx * GE)
            e_row = jnp.where(idx >= 1,
                              _shift_right(pm, NEG) - GO - (idx - 1) * GE,
                              NEG)
            pm2 = _scan_max(base + idx * GE2)
            e2_row = jnp.where(idx >= 1,
                               _shift_right(pm2, NEG) - GO2
                               - (idx - 1) * GE2, NEG)
            h_row = jnp.maximum(base, jnp.maximum(e_row, e2_row))
            h_row = jnp.where(inb, h_row, 0)
            h_scr[:] = h_row
            f_scr[:] = f_row
            f2_scr[:] = f2_row

            # direction byte in the host traceback's priority order
            src = jnp.where(
                h_row == 0, 0,
                jnp.where(h_row == diag, 1,
                          jnp.where(h_row == e_row, 2,
                                    jnp.where(h_row == e2_row, 3,
                                              jnp.where(h_row == f_row, 4,
                                                        jnp.where(
                                                            h_row == f2_row,
                                                            5, 1))))))
            e_ext = (idx > 1) & (e_row == _shift_right(e_row, NEG) - GE)
            e2_ext = (idx > 1) & (e2_row == _shift_right(e2_row, NEG) - GE2)
            f_ext = (idx + 1 < worig) & (i >= 1) \
                & (f_row == _shift_left(f_prev, NEG) - GE)
            f2_ext = (idx + 1 < worig) & (i >= 1) \
                & (f2_row == _shift_left(f2_prev, NEG) - GE2)
            byte = (src | (e_ext.astype(jnp.int32) << 3)
                    | (e2_ext.astype(jnp.int32) << 4)
                    | (f_ext.astype(jnp.int32) << 5)
                    | (f2_ext.astype(jnp.int32) << 6))
            dir_ref[:, r, :] = byte.astype(jnp.int8)

            rowmax = jnp.max(h_row, axis=1, keepdims=True)
            jarg = jnp.min(jnp.where(h_row == rowmax, idx, W),
                           axis=1, keepdims=True).astype(jnp.int32)
            colid = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, 128), 1)
            stat_ref[:, r, :] = jnp.where(colid == 0, rowmax,
                                          jnp.where(colid == 1, jarg, 0))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("A", "B", "GO", "GE", "GO2", "GE2",
                                    "interpret"))
def _long_call(q8, rb8, meta, A, B, GO, GE, GO2, GE2, interpret):
    q = q8.astype(jnp.float32)
    Bt, LQ = q.shape
    W = rb8.shape[2]
    grid = (Bt // TILE_B, LQ // ROWS)
    kernel = _make_kernel(A, B, GO, GE, GO2, GE2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, LQ), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, ROWS, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 128), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_B, ROWS, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, ROWS, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bt, LQ, W), jnp.int8),
            jax.ShapeDtypeStruct((Bt, LQ, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_B, W), jnp.int32),
            pltpu.VMEM((TILE_B, W), jnp.int32),
            pltpu.VMEM((TILE_B, W), jnp.int32),
        ],
        interpret=interpret,
    )(q, rb8, meta)


def _round_up(x, m):
    return -(-x // m) * m


def _build_band(ref_codes: np.ndarray, lq: int, dlo: int, W: int):
    """R_band[i, c] = ref[c + dlo + i] with 4 outside [0, lr) — the per-row
    reference windows, built with one sliding-window view."""
    from numpy.lib.stride_tricks import sliding_window_view

    lr = len(ref_codes)
    lo = dlo  # row 0's first ref index (0-based)
    left_pad = max(0, -lo)
    right_pad = max(0, lo + (lq - 1) + W - lr)
    padded = np.concatenate([
        np.full(left_pad, 4, np.uint8), ref_codes.astype(np.uint8),
        np.full(right_pad, 4, np.uint8)])
    win = sliding_window_view(padded, W)
    start = lo + left_pad
    return win[start: start + lq]


def long_dp_device(q: np.ndarray, ref_codes: np.ndarray, dlo: int, dhi: int,
                   pre, interpret: bool = False):
    """Device twin of align/longread.py::banded_dp_shifted for ONE read
    (batched variant: long_dp_device_batch).  Returns the same
    (score, qs, qe, rs, re, cigar)."""
    return long_dp_device_batch(
        [(q, dlo, dhi)], ref_codes, pre, interpret=interpret)[0]


def long_dp_device_batch(items: list, ref_codes: np.ndarray, pre,
                         interpret: bool = False):
    """items: [(q_codes, dlo, dhi)].  Runs the banded dual-affine DP rows on
    the device (direction bytes + row stats), then replays the z-drop rule
    and walks the traceback on host.  Output is bit-equal to
    banded_dp_shifted per item."""
    lr = len(ref_codes)
    out = [None] * len(items)
    # bucket by padded (LQ, W) so compiled programs are shape-stable;
    # items whose direction matrix would exceed the cell cap (very long
    # reads with wide chain spreads) run the host DP instead — the device
    # path must never allocate multi-GB dirs/band buffers
    MAX_ITEM_CELLS = 32 << 20  # 32 Mcells = 32 MB dirs + band per read
    buckets: dict = {}
    for n, (q, dlo, dhi) in enumerate(items):
        W = _round_up(dhi - dlo + 1, 128)
        LQ = max(_round_up(len(q), 512), 512)
        if LQ * W > MAX_ITEM_CELLS:
            from .longread import banded_dp_shifted

            out[n] = banded_dp_shifted(q, ref_codes, dlo, dhi, pre)
            continue
        buckets.setdefault((LQ, W), []).append(n)
    for (LQ, W), ids in buckets.items():
        for off in range(0, len(ids), TILE_B):
            chunk = ids[off: off + TILE_B]
            Bt = TILE_B
            qb = np.full((Bt, LQ), 4, np.uint8)
            rb = np.full((Bt, LQ, W), 4, np.uint8)
            meta = np.zeros((Bt, 128), np.int32)
            for s, n in enumerate(chunk):
                q, dlo, dhi = items[n]
                qb[s, : len(q)] = q
                rb[s, : len(q)] = _build_band(ref_codes, len(q), dlo, W)
                meta[s, 0] = dlo
                meta[s, 1] = lr
                meta[s, 2] = dhi - dlo + 1
            dirs, stats = _long_call(
                jnp.asarray(qb.astype(np.int8)),
                jnp.asarray(rb.astype(np.int8)), jnp.asarray(meta),
                pre.match, pre.mismatch, pre.gap_open, pre.gap_ext,
                pre.gap_open2, pre.gap_ext2, interpret)
            dirs = np.asarray(dirs)
            stats = np.asarray(stats)
            for s, n in enumerate(chunk):
                q, dlo, dhi = items[n]
                out[n] = _finish_one(q, dlo, dirs[s], stats[s], pre)
    return out


def _finish_one(q, dlo, dirs, stats, pre):
    """Host back half: z-drop replay over row stats + direction-byte
    traceback (mirrors banded_dp_shifted's loop and state machine)."""
    lq = len(q)
    GE = pre.gap_ext
    best = (0, 0, 0)
    rm = stats[:, 0]
    ja = stats[:, 1]
    for i in range(1, lq + 1):
        row_max = int(rm[i - 1])
        cmax = int(ja[i - 1])
        if row_max > best[0]:
            best = (row_max, i, cmax)
        elif best[0] - row_max > pre.zdrop + GE * abs(cmax - best[2]):
            break
    score, bi, bc = best
    if score <= 0:
        return 0, 0, 0, 0, 0, []
    W = dirs.shape[1]
    i, c = bi, bc
    ops = []
    state = "H"
    while i > 0:
        j = c + dlo + i
        if j <= 0:
            break
        byte = int(dirs[i - 1, c])
        src = byte & 7
        if state == "H":
            if src == 0:
                break
            if src == 1:
                ops.append("M")
                i -= 1
            elif src == 2:
                state = "E"
            elif src == 3:
                state = "E2"
            elif src == 4:
                state = "F"
            else:
                state = "F2"
        elif state in ("E", "E2"):
            bit = 3 if state == "E" else 4
            ops.append("D")
            if not (byte >> bit) & 1:
                state = "H"
            c -= 1
        else:  # F / F2
            bit = 5 if state == "F" else 6
            ops.append("I")
            cont = (byte >> bit) & 1
            i -= 1
            c += 1
            if not cont:
                state = "H"
        if c < 0 or c >= W:
            break
    ops.reverse()
    cigar = []
    for op in ops:
        if cigar and cigar[-1][1] == op:
            cigar[-1] = (cigar[-1][0] + 1, op)
        else:
            cigar.append((1, op))
    qs = i
    rs = c + dlo + i
    qe = bi
    re_ = bc + dlo + bi
    return score, qs, qe, max(rs, 0), re_, cigar
