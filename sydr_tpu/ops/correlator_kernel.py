"""Fused Pallas correlation kernel for the batched tracking runtime.

Computes per-128-sample-row partial sums of the correlation streams
(E/P/L x I/Q) over a whole block of IQ samples for all channels in one fused
kernel — carrier generation, mixing, chip reconstruction and the row
reduction never touch HBM between steps. Epoch correlators are then
assembled on the XLA side from a row-level cumulative sum plus a tiny
recomputation of the partial row at each epoch boundary
(``batch_runtime._pass_b``). This replaces the reference C tracking kernel
(``/root/reference/sydr/c_functions/tracking.c:69-96``).

Design (v3) — what the first version got wrong, measured on chip
(docs/performance.md): per-matmul pipeline fill (~50+ cycles) dominates at
small shapes, so its 24 tiny matmuls per 8192-sample sub-chunk (12 one-hot
word picks + 12 prefix ops) cost ~47 ms per second of signal in fill alone,
and the full-prefix output wrote 200 MB/block. This version:

  * **Static schedule.** The grid is ``(n_ch,)`` and the kernel iterates
    sub-chunks in a Python loop, so every millisecond boundary, word-slice
    offset and run split is a compile-time constant. The per-row packed
    code word becomes a static sublane slice of a transposed word column —
    the one-hot pick matmuls disappear entirely.
  * **Shared prompt words.** The extracted chip is ``rolled[8 + idxf]``
    regardless of which word row the bit is read from, so all spacings
    share the ``c0i = 0`` word row with a per-spacing bit index
    (``l = idxf + 2 - cs0``); the word tables carry two extra headroom
    bits for this (``batch_runtime._group_size``).
  * **Row sums, not prefixes.** Each sub-chunk's streams are written into
    a VMEM scratch and reduced by ONE ``[64, S*128] x [S*128, OUTL]``
    block-diagonal-ones matmul (bf16 inputs, f32 accumulation) — the only
    matmul in the kernel. Output is ``[n_ch, n_rows, OUTL]`` row sums:
    128x less HBM traffic than the full prefix.

Constraints: group size 128 and ``samples_per_ms >= CHUNK`` (sampling rate
>= ~8.2 Msps); the XLA dense path remains the fallback (and the
CPU/interpret test oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


CHUNK = 8192   # samples per sub-chunk; must stay <= samples_per_ms
ROWS = CHUNK // 128
WOFF = 64      # front padding rows of the word table (run-b offsets < 0)


def _mix(omega, ph, lm_f, wre, wim):
    """Carrier wipe-off for one row range: (mre, mim)."""
    # NOTE: the TPU VPU has a hardware transcendental unit — sin/cos are
    # nearly free; algebraic carrier factorizations measured slower.
    phase = ph - omega * lm_f
    cosv = jnp.cos(phase)
    sinv = jnp.sin(phase)
    mre = cosv * wre - sinv * wim
    mim = cosv * wim + sinv * wre
    return mre, mim


def _part_streams(spacings, local, step0, d_r, r0, nr,
                  omega, code_step, fb, ph, wt_col, wre, wim):
    """Correlation streams for rows [r0, r0+nr) of one sub-chunk, one run.

    ``d_r`` is the (static) offset of the sub-chunk start from the run's
    millisecond start; ``fb``/``ph`` are the run's per-ms code/carrier
    anchors (SMEM scalars). Returns a list of ``[nr, 128]`` float32 arrays
    ordered (spacing-major, I then Q).
    """
    row_i = jax.lax.broadcasted_iota(jnp.int32, (nr, 128), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (nr, 128), 1)
    base = d_r + r0 * 128
    lm = base + row_i * 128 + col_i
    lm_f = lm.astype(jnp.float32)

    mre, mim = _mix(omega, ph, lm_f, wre, wim)

    # Per-row packed word: group index is A + row for lanes below the
    # (static) threshold, A + row + 1 above — two static sublane slices of
    # the transposed word column plus one lane-threshold select.
    a_off = base >> 7
    lam = 128 - (base - (a_off << 7))
    w_lo = wt_col[WOFF + a_off: WOFF + a_off + nr]          # [nr, 1]
    w_hi = wt_col[WOFF + a_off + 1: WOFF + a_off + nr + 1]  # [nr, 1]
    w = jnp.where(col_i >= lam, w_hi, w_lo)

    grp = lm >> 7
    cs0v = jnp.floor(grp.astype(jnp.float32) * (128.0 * step0)).astype(
        jnp.int32)
    a = fb + lm_f * code_step

    streams = []
    for sp in spacings:
        idxf = jnp.ceil(a + sp).astype(jnp.int32)
        # chip = l-th bit of the shared (c0i=0) word; extracted
        # arithmetically via an exponent-field bitcast (2^-l) and floors.
        l = jnp.clip(idxf + 2 - cs0v, 0, local - 1)
        p2 = pltpu.bitcast(((127 - l) << 23).astype(jnp.int32), jnp.float32)
        t = w * p2
        bit = jnp.floor(t) - 2.0 * jnp.floor(t * 0.5)
        chip = 2.0 * bit - 1.0
        streams.append(chip * mre)
        streams.append(chip * mim)
    return streams


def _kernel(spacings, spms, n_q, local, step0, n_sub, outl,
            sc_ref, fbq_ref, phq_ref, win_re_ref, win_im_ref, wt_ref,
            out_ref, x_ref):
    """Grid (n_ch,); out block = (1, n_sub*64, outl) row sums."""
    c = pl.program_id(0)
    n_streams = 2 * len(spacings)
    omega = sc_ref[c, 0]
    code_step = sc_ref[c, 1]
    wt_col = wt_ref[0]  # [G_pad, 1]

    # Block-diagonal ones: column s sums the s-th stream's 128 lanes.
    bmat = (
        (jax.lax.broadcasted_iota(jnp.int32, (n_streams * 128, outl), 0)
         >> 7)
        == jax.lax.broadcasted_iota(jnp.int32, (n_streams * 128, outl), 1)
    ).astype(jnp.bfloat16)

    for k in range(n_sub):
        m0 = k * CHUNK
        q0 = min(m0 // spms, n_q - 1)
        q1 = min(q0 + 1, n_q - 1)
        ms_next = (q0 + 1) * spms
        wre = win_re_ref[k]
        wim = win_im_ref[k]

        def emit(q, d_r, r0, nr, wre=wre, wim=wim):
            return _part_streams(
                spacings, local, step0, d_r, r0, nr,
                omega, code_step, fbq_ref[c, q], phq_ref[c, q], wt_col,
                wre[r0:r0 + nr], wim[r0:r0 + nr],
            )

        def store(r0, nr, streams):
            for i, s in enumerate(streams):
                x_ref[r0:r0 + nr, i * 128:(i + 1) * 128] = s.astype(
                    jnp.bfloat16)

        d_a = m0 - q0 * spms
        if m0 + CHUNK <= ms_next:
            store(0, ROWS, emit(q0, d_a, 0, ROWS))
        else:
            # The millisecond boundary lands inside this sub-chunk: pure
            # run-a rows below, pure run-b rows above, and one 8-row band
            # around the boundary computed for both runs + element select.
            bnd = ms_next - m0
            d_b = m0 - ms_next
            ra8 = (bnd >> 7) & ~7
            nm = min(8, ROWS - ra8)
            if ra8 > 0:
                store(0, ra8, emit(q0, d_a, 0, ra8))
            sa = emit(q0, d_a, ra8, nm)
            sb = emit(q1, d_b, ra8, nm)
            row_i = jax.lax.broadcasted_iota(jnp.int32, (nm, 128), 0)
            col_i = jax.lax.broadcasted_iota(jnp.int32, (nm, 128), 1)
            in_b = (ra8 * 128 + row_i * 128 + col_i) >= bnd
            store(ra8, nm, [jnp.where(in_b, b, a)
                            for a, b in zip(sa, sb)])
            if ra8 + nm < ROWS:
                store(ra8 + nm, ROWS - ra8 - nm,
                      emit(q1, d_b, ra8 + nm, ROWS - ra8 - nm))

        # The only matmul: bf16 inputs, f32 accumulation. The per-sample
        # bf16 rounding is ~-48 dB against the thermal noise floor.
        rs = jnp.dot(x_ref[...], bmat, preferred_element_type=jnp.float32)
        out_ref[0, k * ROWS:(k + 1) * ROWS, :] = rs


@functools.partial(
    jax.jit,
    static_argnames=("spacings", "spms", "n_q", "local", "step0",
                     "interpret"),
)
def block_rowsum_streams(
    window_re, window_im, words_t, fb_q, phic_q, scalars,
    *, spacings, spms, n_q, local, step0, interpret=False,
):
    """Per-row (128-sample) sums of the correlation streams.

    Args:
        window_re/im: ``[n_win_pad]`` float32 (padded to CHUNK multiple).
        words_t: ``[n_ch, G_pad, 1]`` packed code words as per-channel
            sublane columns, with ``WOFF`` zero rows in front
            (see ``batch_runtime``).
        fb_q, phic_q: ``[n_ch, n_q]`` per-ms code/carrier phase anchors.
        scalars: ``[n_ch, 8]`` per-channel (omega, code_step, ...).

    Returns ``[n_ch, n_win_pad // 128, OUTL]`` float32: element
    ``[c, r, s]`` is the sum of stream ``s`` over samples
    ``[128 r, 128 (r+1))`` (streams ordered spacing-major I then Q; lanes
    ``>= 2 * len(spacings)`` are zero padding).
    """
    n_ch = words_t.shape[0]
    g_pad = words_t.shape[1]
    n_streams = 2 * len(spacings)
    outl = -(-n_streams // 8) * 8
    n_win_pad = window_re.shape[0]
    assert n_win_pad % CHUNK == 0
    assert spms >= CHUNK, "kernel requires samples_per_ms >= CHUNK"
    n_sub = n_win_pad // CHUNK
    win2 = window_re.reshape(n_sub, ROWS, 128)
    win2i = window_im.reshape(n_sub, ROWS, 128)

    kern = functools.partial(
        _kernel, spacings, spms, n_q, local, step0, n_sub, outl
    )
    in_specs = [
        pl.BlockSpec((n_ch, 8), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_ch, n_q), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_ch, n_q), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_sub, ROWS, 128), lambda c: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_sub, ROWS, 128), lambda c: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, g_pad, 1), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kern,
        grid=(n_ch,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_sub * ROWS, outl),
                               lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ch, n_sub * ROWS, outl),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROWS, n_streams * 128), jnp.bfloat16)],
        interpret=interpret,
    )(scalars, fb_q, phic_q, win2, win2i, words_t)
