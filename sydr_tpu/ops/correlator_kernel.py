"""Fused Pallas correlation kernel for the batched tracking runtime.

Computes the running cumulative sums of the six-to-ten correlation streams
(E/P/L x I/Q) over a whole block of IQ samples for all channels in one
fused kernel — carrier generation, mixing, chip reconstruction and prefix
summation never touch HBM between steps. This replaces the reference C
tracking kernel (``/root/reference/sydr/c_functions/tracking.c:69-96``)
and the XLA dense pass of ``sydr_tpu.channels.batch_runtime`` (HBM-bound
at ~35 materialised [n_ch, n_win] intermediates).

Two output forms exist: the round-1 full-prefix kernel (per-sample
inclusive prefixes + XLA boundary gather) and the round-2 production
``rowsum`` kernel (bf16 per-row totals + gather-free XLA boundary
recompute) — the eleventh structural alternative tried against the
full-prefix form and the first to beat it (docs/performance.md walks
through the ten losers and the design rules they taught).

Chip reconstruction inside the kernel (no gathers — Mosaic on this backend
supports none):
  * code phase is linear in the window sample index (frozen-rate blocks);
    per-millisecond anchors ``fb_q``/``phic_q`` carry float32 precision;
  * each 128-lane row spans ``Q + 1`` candidate ``gsize``-sample chip
    groups (``Q = 128 // gsize``); their packed code words come from one
    contiguous dynamic sublane slice of a per-channel word table
    (:func:`wtab_geometry`) and a per-lane quadrant select;
  * the chip is the ``l``-th bit of the word, extracted arithmetically via
    an exponent-field bitcast (2^-l), floor and an FMA — or, with
    sample-quantised spacings, reconstructed once at the base spacing and
    lane-rolled to the other taps.

Constraints: sub-chunks are whole multiples of 8 vector rows inside one
millisecond, i.e. sampling rate >= ~1.05 Msps (``gsize`` down to 8 keeps
the per-group chip span in a 24-bit word at any rate); the XLA dense path
remains the fallback below that (and the CPU/interpret test oracle).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


CHUNK = 8192   # max sub-chunk (callers shrink it to <= samples_per_ms)
ROWS = CHUNK // 128
SUPER = 4      # min sub-chunks per program (callers raise it ~32k/chunk)
C0I_MIN = -1
C0I_ROWS = 4
_ABLATE = None  # measurement hook (tools/): "notrig" | "noword" | ... | None
# Program-global tap shifts (rowsum kernel, quantised spacings): reconstruct
# the base chip stream on exact [rows, 128] sub-chunk grids, concatenate the
# whole program once, and lane/row-roll the [R + 8, 128] program per tap —
# the 8-row lookahead is then paid once per PROGRAM instead of once per
# sub-chunk (+50% rows at the decimated shape). Ablation switch for A/B.
_PROG_SHIFTS = os.environ.get("SYDR_PROG_SHIFTS", "1") == "1"


def wtab_geometry(spms: int, gsize: int) -> tuple[int, int]:
    """(LEAD_U, U_PAD) for the lane-expanded word table.

    Table row ``u`` holds the ``Q = 128 // gsize`` group words of one
    128-sample vector row, each broadcast over its ``gsize`` lanes:
    ``E[u, l] = word[Q*u + (l >> gshift)]``. A ms-run's words are a
    CONTIGUOUS sublane slice at dynamic offset ``LEAD_U + ua`` rotated by
    ``(l0 & 127)`` lanes with a row-carry select (``words_for_run``).
    ``ua`` ranges over ``[-(spms-1)//128 - 1, (spms-1)//128]`` (run b
    starts up to one whole ms after the sub-chunk start), hence the LEAD
    zero rows; the tail pads the longest slice (ROWS + 8 sample rows + 8
    carry/alignment rows).
    """
    lead_u = ((spms - 1) >> 7) + 2
    u_pad = lead_u + ((spms - 1) >> 7) + 1 + (CHUNK // 128) + 16
    u_pad += (-u_pad) % 8
    return lead_u, u_pad


def _sub_streams(spacings, spms, n_q, local, step0, gsize, chunk, super_n,
                 sc_ref, fbq_ref, phq_ref, win_re_ref, win_im_ref,
                 wtab_ref, c, k, shifts=None):
    """The six-to-ten correlation streams for one CHUNK sub-chunk.

    Carrier mix + chip reconstruction for every spacing, returned as a list
    of [ROWS, 128] float32 arrays ordered (spacing-major, I then Q).

    With ``shifts = (base_spacing, (k0, k1, ...))`` (sample-quantised
    spacings), the chip stream is reconstructed ONCE at the base spacing on
    an extended row grid and each correlator's chips are a forward shift of
    it by ``k_s`` whole samples (two ``pltpu.roll``s + one lane select) —
    hardware-correlator tap semantics, ~1/3 of the per-spacing VPU work.

    ``wtab_ref`` is the (1, C0I_ROWS(+drift), U_PAD, 128) LANE-EXPANDED
    word table (``batch_runtime._kernel_word_table``): row ``u``, lane
    ``l`` holds ``word[Q*u + (l >> gshift)]``, so per-run words are one
    contiguous dynamic sublane slice + one dynamic lane-rotation + a
    row-carry select (``words_for_run``) — exact f32, no matmuls, no
    gathers, and Q-INDEPENDENT cost (the earlier ``[.., 2Q]`` packed table
    needed a 2Q-way per-lane select chain: 6.2 of the 11.2 ms/s decimated
    kernel at Q = 4; before that, one-hot word-pick matmuls measured
    12.4 ms/s of the 37 ms/s rowsum kernel). ``gsize`` in {8..128}
    supports any sampling rate whose chip span per group packs into
    ``local`` <= 24 bits.
    """
    omega = sc_ref[c, 0]
    code_step = sc_ref[c, 1]
    # Integer chip drift of this block vs the (superblock-hoisted) word
    # table's roll origin: a plain row offset into the drift-EXTENDED C0I
    # axis (0 with a per-block table). See batch_runtime.make_wordpack.
    d_off = sc_ref[c, 2].astype(jnp.int32)
    gshift = gsize.bit_length() - 1
    rows = chunk // 128

    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    lane = col_i

    sub = k % super_n
    m0 = k * chunk
    q0 = m0 // spms
    q1 = jnp.minimum(q0 + 1, n_q - 1)
    ms_next = (q0 + 1) * spms

    fb0 = fbq_ref[c, q0]
    fb1 = fbq_ref[c, q1]
    ph0 = phq_ref[c, q0]
    ph1 = phq_ref[c, q1]

    m = m0 + row_i * 128 + col_i
    in_q1 = m >= ms_next
    lm = jnp.where(in_q1, m - ms_next, m - q0 * spms)
    lm_f = lm.astype(jnp.float32)

    # NOTE: the TPU VPU has a hardware transcendental unit — a factored
    # rank-1 carrier (sincos on ROWS+128 values + angle-addition
    # reconstruction) measured ~15% SLOWER than the direct form below.
    # (Re-measured in round 2 under the rowsum kernel: sincos is 6.4 ms/s of
    # the 37 ms/s kernel; the rank-1 factored carrier measured 12.6 ms/s
    # SLOWER again. The direct form stands.)
    phase = jnp.where(in_q1, ph1, ph0) - omega * lm_f
    if _ABLATE == "notrig":
        cosv = phase * 1e-6
        sinv = phase * -1e-6
    else:
        cosv = jnp.cos(phase)
        sinv = jnp.sin(phase)
    # NOTE: a bf16 mix + integer (variable-shift) chip extract was built
    # and trace-profiled in round 2 on the theory that the kernel is
    # VMEM-traffic-bound: it measured SLOWER (30.8 vs 28.1 ms/s kernel) —
    # int32<->bf16 casts and mixed-dtype relayouts cost more than the
    # halved element width saves. f32 elementwise + one bf16 cast at the
    # matmul input stands.
    wre = win_re_ref[0, sub].reshape(rows, 128)
    wim = win_im_ref[0, sub].reshape(rows, 128)
    mre = cosv * wre - sinv * wim
    mim = cosv * wim + sinv * wre

    grp = lm >> gshift
    cs0v = jnp.floor(grp.astype(jnp.float32) * (gsize * step0)).astype(
        jnp.int32
    )

    lead_u, _ = wtab_geometry(spms, gsize)

    def words_for_run(fb_s, q_start_m, m0=m0, n_rows=rows, col=None):
        """Per-sample packed words (and the run's c0i) for one ms-run.

        The word table is LANE-EXPANDED (``_kernel_word_table``): table row
        ``u``, lane ``l`` holds ``word[Q*u + (l >> gshift)]``. Sample
        (row, lane) of a run starting at in-ms offset ``l0`` needs
        ``word[Q*(ua + row) + aoff + ((l + rless) >> gshift)]`` with
        per-run scalars ``ua = l0 >> 7``, ``aoff``, ``rless`` — which is
        exactly the expanded table at ``[ua + row (+1 on lane wrap),
        (l + r) mod 128]`` with ``r = l0 & 127``. So the pick is ONE
        dynamic sublane slice, ONE dynamic lane-rotation and a row-carry
        select — replacing the ``2Q``-way per-lane select chain that
        measured 6.2 of the 11.2 ms/s decimated kernel (Q = 4 there).
        ``ua`` is negative for runs starting after the sub-chunk (run b):
        those rows read the LEAD zero rows and are masked by ``in_q1``
        anyway.
        """
        col_l = col_i if col is None else col
        c0i = jnp.floor(fb_s).astype(jnp.int32)                # scalar
        rowsel = jnp.clip(c0i - C0I_MIN, 0, C0I_ROWS - 1) + d_off
        l0 = m0 - q_start_m                                    # scalar
        ua = jax.lax.shift_right_arithmetic(l0, 7)
        r = l0 & 127
        es = wtab_ref[0, rowsel, pl.ds(lead_u + ua, n_rows + 8), :]
        if gsize == 128:
            # Q == 1: the table ships lane-1 (every lane of a row holds
            # the same word, batch_runtime._kernel_word_table); the
            # row-carry select lane-broadcasts it in VMEM.
            up = pltpu.roll(es, n_rows + 8 - 1, axis=0)
            w = jnp.where(
                col_l < 128 - r,
                jnp.broadcast_to(es[0:n_rows], (n_rows, 128)),
                jnp.broadcast_to(up[0:n_rows], (n_rows, 128)))
            return c0i, w
        rot = pltpu.roll(es, (128 - r) & 127, axis=1)
        up = pltpu.roll(rot, n_rows + 8 - 1, axis=0)
        w = jnp.where(col_l < 128 - r, rot[0:n_rows], up[0:n_rows])
        return c0i, w

    if shifts is not None:
        # --- Shared base chip stream + per-spacing sample shifts ----------
        base_sp, ks_list = shifts
        RE = rows + 8  # 8 lookahead rows (tile-aligned)
        row_e = jax.lax.broadcasted_iota(jnp.int32, (RE, 128), 0)
        col_e = jax.lax.broadcasted_iota(jnp.int32, (RE, 128), 1)
        m_e = m0 + row_e * 128 + col_e
        in_q1e = m_e >= ms_next
        lm_e = jnp.where(in_q1e, m_e - ms_next, m_e - q0 * spms)
        lm_ef = lm_e.astype(jnp.float32)
        grp_e = lm_e >> gshift
        cs0v_e = jnp.floor(
            grp_e.astype(jnp.float32) * (gsize * step0)).astype(jnp.int32)

        if _ABLATE == "noword":
            w = jnp.float32(11184810.0)  # 0b1010... pattern, no word picks
            r_el = jnp.where(in_q1e, fb1 + base_sp, fb0 + base_sp)
            c0i_el = jnp.zeros_like(cs0v_e)
        else:
            c0i_a, w_a = words_for_run(
                fb0 + base_sp, q0 * spms, n_rows=RE, col=col_e)
            c0i_b, w_b = words_for_run(
                fb1 + base_sp, ms_next, n_rows=RE, col=col_e)
            w = jnp.where(in_q1e, w_b, w_a)
            r_el = jnp.where(in_q1e, fb1 + base_sp, fb0 + base_sp)
            c0i_el = jnp.where(in_q1e, c0i_b, c0i_a)
        if _ABLATE == "nobit":
            bit = ((lm_e & 2) >> 1).astype(jnp.float32)
        else:
            idxf = jnp.ceil(r_el + lm_ef * code_step).astype(jnp.int32)
            l = jnp.clip(idxf - c0i_el + 2 - cs0v_e, 0, local - 1)
            p2 = pltpu.bitcast(
                ((127 - l) << 23).astype(jnp.int32), jnp.float32)
            t = w * p2
            bit = jnp.floor(t) - 2.0 * jnp.floor(t * 0.5)      # [RE, 128]

        streams = []
        for ksh in ks_list:
            if ksh == 0 or _ABLATE == "noroll":
                b = bit[0:rows]
            else:
                # stream_s[m] = base_chip[m + ksh]: lane roll + row carry.
                # Rolls stay 32-bit — Mosaic's dynamic_rotate has no bf16
                # lowering ("Rotate with non-32-bit data").
                # (pltpu.roll takes non-negative shifts; 128-k == -k mod 128)
                a = pltpu.roll(bit, 128 - ksh, axis=1)
                a_up = pltpu.roll(a, RE - 1, axis=0)
                b = jnp.where(col_i < 128 - ksh,
                              a[0:rows], a_up[0:rows])
            chip = 2.0 * b - 1.0
            # (bf16 products measured neutral-to-slower: bf16 elementwise
            # does not pack 2x on this VPU and the casts eat the width.)
            streams.append(chip * mre)
            streams.append(chip * mim)
        return streams

    streams = []
    for sp in spacings:
        c0i_a, w_a = words_for_run(fb0 + sp, q0 * spms)
        c0i_b, w_b = words_for_run(fb1 + sp, ms_next)
        w = jnp.where(in_q1, w_b, w_a)

        r_el = jnp.where(in_q1, fb1 + sp, fb0 + sp)
        c0i_el = jnp.where(in_q1, c0i_b, c0i_a)
        idxf = jnp.ceil(r_el + lm_f * code_step).astype(jnp.int32)
        l = jnp.clip(idxf - c0i_el + 2 - cs0v, 0, local - 1)
        p2 = pltpu.bitcast(((127 - l) << 23).astype(jnp.int32), jnp.float32)
        t = w * p2
        bit = jnp.floor(t) - 2.0 * jnp.floor(t * 0.5)
        chip = 2.0 * bit - 1.0
        streams.append(chip * mre)
        streams.append(chip * mim)
    return streams


def _kernel(spacings, spms, n_q, local, step0, gsize, chunk, super_n,
            n_win, shifts,
            sc_ref, fbq_ref, phq_ref, win_re_ref, win_im_ref, words_ref,
            out_ref, carry_ref):
    """Grid (n_super, n_ch) — time OUTER so the shared window block is
    fetched once per super-chunk (see ``_kernel_rowsum``); out block =
    (1, 6, SUPER*CHUNK) running prefix."""
    ks = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(ks == 0)
    def _():
        for i in range(16):
            carry_ref[c, i] = 0.0

    rows = chunk // 128
    # strict-lower-triangular matrix for row-prefix accumulation
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    ).astype(jnp.float32)
    # inclusive upper-triangular matrix: lane-axis prefix sums via the MXU
    # (Mosaic has no cumsum primitive)
    tri_incl = (
        jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.float32)

    for sub in range(super_n):
      k = ks * super_n + sub
      streams = _sub_streams(
          spacings, spms, n_q, local, step0, gsize, chunk, super_n,
          sc_ref, fbq_ref, phq_ref, win_re_ref, win_im_ref, words_ref, c, k,
          shifts=shifts,
      )
      for out_idx, s in enumerate(streams):
          # bf16 inputs, f32 accumulation: 4x MXU rate; the per-sample
          # rounding (2^-9 relative) is ~-48 dB against the thermal noise
          # floor and the prefix accumulates in f32. The row totals for
          # the cross-row prefix are recomputed below from the f32 sums.
          cs_row = jnp.dot(s.astype(jnp.bfloat16),
                           tri_incl.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
          row_tot = cs_row[:, 127:128]
          # strict-lower triangular matmul: prefix of previous row totals
          # default (single-pass) precision: row_tot is noise-dominated
          # float data; the bf16 rounding here is ~-48 dB like cs_row's
          row_pref = jnp.dot(tri, row_tot,
                             preferred_element_type=jnp.float32)
          prefix = cs_row + row_pref
          carry = carry_ref[c, out_idx]
          out_ref[0, out_idx, pl.ds(sub * chunk, chunk)] = (
              prefix + carry
          ).reshape(chunk)
          carry_ref[c, out_idx] = carry + jnp.sum(row_tot)


def _sub_mix(spms, n_q, chunk, sc_ref, fbq_ref, phq_ref,
             win_re_ref, win_im_ref, c, k, sub):
    """Carrier-mixed window planes (mre, mim) for one sub-chunk, [rows, 128].

    Identical arithmetic to the common part of :func:`_sub_streams` (same
    two-run per-ms anchor logic, same direct sincos)."""
    omega = sc_ref[c, 0]
    rows = chunk // 128
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    m0 = k * chunk
    q0 = m0 // spms
    q1 = jnp.minimum(q0 + 1, n_q - 1)
    ms_next = (q0 + 1) * spms
    ph0 = phq_ref[c, q0]
    ph1 = phq_ref[c, q1]
    m = m0 + row_i * 128 + col_i
    in_q1 = m >= ms_next
    lm = jnp.where(in_q1, m - ms_next, m - q0 * spms)
    phase = jnp.where(in_q1, ph1, ph0) - omega * lm.astype(jnp.float32)
    if _ABLATE == "notrig":
        cosv = phase * 1e-6
        sinv = phase * -1e-6
    else:
        cosv = jnp.cos(phase)
        sinv = jnp.sin(phase)
    wre = win_re_ref[0, sub].reshape(rows, 128)
    wim = win_im_ref[0, sub].reshape(rows, 128)
    mre = cosv * wre - sinv * wim
    mim = cosv * wim + sinv * wre
    return mre, mim


def _base_bits(spms, n_q, local, step0, gsize, base_sp,
               sc_ref, fbq_ref, wtab_ref, c, m0, n_rows, clamp_q0=False):
    """Base-spacing chip bits on an arbitrary row grid, ``[n_rows, 128]``.

    The per-sample word-pick + exponent-bitcast extraction of
    :func:`_sub_streams`' quantised-tap branch, factored out so the
    program-global shifts path can evaluate it per sub-chunk on exact
    ``[rows, 128]`` grids plus ONE 8-row virtual lookahead tail per program
    (``clamp_q0=True`` there: the tail's ``m0`` can sit past the last
    anchor millisecond in the zero-pad region; clamping keeps the SMEM
    anchor reads and the word-table slice in bounds — the values multiply
    zero window)."""
    code_step = sc_ref[c, 1]
    d_off = sc_ref[c, 2].astype(jnp.int32)
    gshift = gsize.bit_length() - 1
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
    q0 = m0 // spms
    if clamp_q0:
        q0 = jnp.minimum(q0, n_q - 1)
    q1 = jnp.minimum(q0 + 1, n_q - 1)
    ms_next = (q0 + 1) * spms
    fb0 = fbq_ref[c, q0]
    fb1 = fbq_ref[c, q1]
    m = m0 + row_i * 128 + col_i
    in_q1 = m >= ms_next
    lm = jnp.where(in_q1, m - ms_next, m - q0 * spms)
    lm_f = lm.astype(jnp.float32)
    grp = lm >> gshift
    cs0v = jnp.floor(grp.astype(jnp.float32) * (gsize * step0)).astype(
        jnp.int32)
    lead_u, u_pad = wtab_geometry(spms, gsize)

    def wfr(fb_s, q_start_m):
        c0i = jnp.floor(fb_s).astype(jnp.int32)
        rowsel = jnp.clip(c0i - C0I_MIN, 0, C0I_ROWS - 1) + d_off
        l0 = m0 - q_start_m
        ua = jax.lax.shift_right_arithmetic(l0, 7)
        if clamp_q0:
            # deep-pad safety: a clamped q0 can push the slice offset past
            # the table; pin it to the last in-bounds slice (those rows'
            # values multiply zero window downstream).
            ua = jnp.minimum(ua, u_pad - lead_u - (n_rows + 8))
        r = l0 & 127
        es = wtab_ref[0, rowsel, pl.ds(lead_u + ua, n_rows + 8), :]
        if gsize == 128:
            # lane-1 table (see words_for_run): broadcast in VMEM
            up = pltpu.roll(es, n_rows + 8 - 1, axis=0)
            w = jnp.where(
                col_i < 128 - r,
                jnp.broadcast_to(es[0:n_rows], (n_rows, 128)),
                jnp.broadcast_to(up[0:n_rows], (n_rows, 128)))
            return c0i, w
        rot = pltpu.roll(es, (128 - r) & 127, axis=1)
        up = pltpu.roll(rot, n_rows + 8 - 1, axis=0)
        w = jnp.where(col_i < 128 - r, rot[0:n_rows], up[0:n_rows])
        return c0i, w

    if _ABLATE == "noword":
        w = jnp.float32(11184810.0)
        r_el = jnp.where(in_q1, fb1 + base_sp, fb0 + base_sp)
        c0i_el = jnp.zeros_like(cs0v)
    else:
        c0i_a, w_a = wfr(fb0 + base_sp, q0 * spms)
        c0i_b, w_b = wfr(fb1 + base_sp, ms_next)
        w = jnp.where(in_q1, w_b, w_a)
        r_el = jnp.where(in_q1, fb1 + base_sp, fb0 + base_sp)
        c0i_el = jnp.where(in_q1, c0i_b, c0i_a)
    if _ABLATE == "nobit":
        return ((lm & 2) >> 1).astype(jnp.float32)
    idxf = jnp.ceil(r_el + lm_f * code_step).astype(jnp.int32)
    l = jnp.clip(idxf - c0i_el + 2 - cs0v, 0, local - 1)
    p2 = pltpu.bitcast(((127 - l) << 23).astype(jnp.int32), jnp.float32)
    t = w * p2
    return jnp.floor(t) - 2.0 * jnp.floor(t * 0.5)


def _kernel_rowsum(spacings, spms, n_q, local, step0, gsize, chunk,
                   super_n, n_win, shifts,
                   sc_ref, fbq_ref, phq_ref, win_re_ref, win_im_ref,
                   words_ref, out_ref):
    """Row-level variant: out block = (1, SUPER*ROWS, n_streams) bfloat16
    per-128-sample-row TOTALS, streams minor — sublane-aligned stores,
    ~1/42 the HBM write volume of the full-prefix kernel (the 6-lane minor
    dim still tile-pads to 128). The inclusive row prefix is an exact f32
    ``cumsum`` in XLA (trivial at 1/128 the sample count), and
    boundary-straddling rows are recomputed densely there too
    (``batch_runtime._rowsum_boundary_prefix``). bf16 row totals add
    ~2^-9-relative rounding per ROW total — ~2e-4 of an epoch sum, -37 dB
    below the bf16 product rounding already accepted per sample.

    All streams reduce in ONE natural matmul per sub-chunk: a lane-concat
    of the streams against a block-diagonal ones matrix — versus 12
    per-stream matmuls in the full-prefix kernel; no cross-chunk carry
    state at all.

    Grid is (n_super, n_ch) — time-block OUTER, channel INNER — so the
    shared sample-window block index is constant across the inner loop and
    Mosaic fetches it once per super-chunk instead of once per (channel,
    super-chunk)."""
    ks = pl.program_id(0)
    c = pl.program_id(1)
    n_streams = 2 * len(spacings)
    rows = chunk // 128

    # block-diagonal ones: column s sums stream s's 128 lanes of the concat
    blk_r = jax.lax.broadcasted_iota(jnp.int32, (n_streams * 128, n_streams), 0)
    blk_c = jax.lax.broadcasted_iota(jnp.int32, (n_streams * 128, n_streams), 1)
    blkdiag = ((blk_r >> 7) == blk_c).astype(jnp.bfloat16)

    if shifts is not None and _PROG_SHIFTS:
        # Program-global tap shifts: base chips on exact [rows, 128] grids
        # per sub-chunk (consecutive sub-chunks ARE each other's lookahead),
        # ONE 8-row virtual tail per program, and the per-tap lane/row
        # rolls once on the concatenated [R + 8, 128] program — the +8-row
        # lookahead reconstruction (+50% rows at the decimated shape) and
        # 2*super_n rolls per tap collapse to a once-per-program cost.
        # Bit-identical to the per-sub-chunk form: interior lookahead rows
        # equal the next sub-chunk's own rows (same m -> same run anchors
        # -> same f32 expressions), and taps shift <= ~13 samples so the
        # used lookahead never crosses a second ms boundary.
        base_sp, ks_list = shifts
        R = super_n * rows
        bits, mres, mims = [], [], []
        for sub in range(super_n):
            k = ks * super_n + sub
            mre, mim = _sub_mix(spms, n_q, chunk, sc_ref, fbq_ref, phq_ref,
                                win_re_ref, win_im_ref, c, k, sub)
            bits.append(_base_bits(spms, n_q, local, step0, gsize, base_sp,
                                   sc_ref, fbq_ref, words_ref, c, k * chunk,
                                   rows))
            mres.append(mre)
            mims.append(mim)
        bits.append(_base_bits(spms, n_q, local, step0, gsize, base_sp,
                               sc_ref, fbq_ref, words_ref, c,
                               (ks * super_n + super_n) * chunk, 8,
                               clamp_q0=True))
        bit_all = jnp.concatenate(bits, axis=0)          # [R + 8, 128]
        mre_all = jnp.concatenate(mres, axis=0)          # [R, 128]
        mim_all = jnp.concatenate(mims, axis=0)
        col_all = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        streams = []
        for ksh in ks_list:
            if ksh == 0 or _ABLATE == "noroll":
                b = bit_all[0:R]
            else:
                a = pltpu.roll(bit_all, 128 - ksh, axis=1)
                a_up = pltpu.roll(a, R + 8 - 1, axis=0)
                b = jnp.where(col_all < 128 - ksh, a[0:R], a_up[0:R])
            chip = 2.0 * b - 1.0
            streams.append((chip * mre_all).astype(jnp.bfloat16))
            streams.append((chip * mim_all).astype(jnp.bfloat16))
        s_all = jnp.concatenate(streams, axis=1)
    else:
        cats = []
        for sub in range(super_n):
            k = ks * super_n + sub
            streams = _sub_streams(
                spacings, spms, n_q, local, step0, gsize, chunk, super_n,
                sc_ref, fbq_ref, phq_ref, win_re_ref, win_im_ref, words_ref,
                c, k, shifts=shifts,
            )
            # Same bf16-input / f32-accumulate products as the full-prefix
            # kernel's cs_row matmul, so row totals match it bit-for-bit up
            # to summation order.
            cats.append(jnp.concatenate(
                [s.astype(jnp.bfloat16) for s in streams], axis=1))
        s_all = jnp.concatenate(cats, axis=0)
    # ONE reduction matmul + ONE store per kernel program, not per
    # sub-chunk: rows are independent in the contraction (bitwise-identical
    # outputs), and the per-sub-chunk matmul/store ISSUE cost was the bulk
    # of the kernel's rate-independent floor (~39k sub-chunks/s at the
    # product shape). s_all is [super_n*rows, n_streams*128] bf16 —
    # [512, 768] ≈ 0.75 MB at both the full-rate and decimated product
    # shapes (plus the per-stream pieces held live before the concat),
    # comfortably VMEM.
    row_tot = jnp.dot(s_all, blkdiag,
                      preferred_element_type=jnp.float32)
    out_ref[0, :, :] = row_tot.astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("spacings", "spms", "n_q", "local", "step0", "gsize",
                     "chunk", "super_n", "n_win", "interpret", "shifts"),
)
def block_rowsum_streams(
    window_re, window_im, words, fb_q, phic_q, scalars,
    *, spacings, spms, n_q, local, step0, gsize=128, chunk=CHUNK,
    super_n=SUPER, n_win, interpret=False, shifts=None,
):
    """Per-128-sample-row totals of the correlation streams.

    Same inputs as :func:`block_cumsum_streams` (``words`` is the
    lane-expanded ``[n_ch, n_rows, U_PAD, 128]`` table of
    ``batch_runtime._kernel_word_table`` / :func:`wtab_geometry`); returns
    ``[n_ch, n_rows_pad, n_streams]``
    bfloat16 (streams MINOR) where entry ``[c, r, s]`` is the sum of
    stream ``s`` over samples ``[128 * r, 128 * (r + 1))``. The caller
    cumsums in f32 for the inclusive row prefix. (A rows-major output
    that would make the boundary recompute's flatten copy-free was tried:
    Mosaic tiles the last two block dims, so a ``(rows, 1, streams)``
    block degenerates to per-row (1, 6) tiles.)
    """
    n_ch = words.shape[0]
    w_rows, u_pad, w_lanes = words.shape[1], words.shape[2], words.shape[3]
    n_streams = 2 * len(spacings)
    n_win_pad = window_re.shape[0]
    rows = chunk // 128
    assert n_win_pad % (super_n * chunk) == 0, n_win_pad
    n_super = n_win_pad // (super_n * chunk)
    n_rows_pad = n_win_pad // 128
    win2 = window_re.reshape(n_super, super_n, rows, 128)
    win2i = window_im.reshape(n_super, super_n, rows, 128)

    kern = functools.partial(
        _kernel_rowsum, spacings, spms, n_q, local, step0, gsize, chunk,
        super_n, n_win, shifts,
    )
    in_specs = [
        pl.BlockSpec((n_ch, 8), lambda k, c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_ch, n_q), lambda k, c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_ch, n_q), lambda k, c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, super_n, rows, 128), lambda k, c: (k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, super_n, rows, 128), lambda k, c: (k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w_rows, u_pad, w_lanes),
                     lambda k, c: (c, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kern,
        grid=(n_super, n_ch),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, super_n * rows, n_streams),
                               lambda k, c: (c, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ch, n_rows_pad, n_streams),
                                       jnp.bfloat16),
        interpret=interpret,
    )(scalars, fb_q, phic_q, win2, win2i, words)


@functools.partial(
    jax.jit,
    static_argnames=("spacings", "spms", "n_q", "local", "step0", "gsize",
                     "chunk", "super_n", "n_win", "interpret", "shifts"),
)
def block_cumsum_streams(
    window_re, window_im, words, fb_q, phic_q, scalars,
    *, spacings, spms, n_q, local, step0, gsize=128, chunk=CHUNK,
    super_n=SUPER, n_win, interpret=False, shifts=None,
):
    """Running prefix sums of the six correlation streams.

    Args:
        window_re/im: ``[n_win_pad]`` float32 (padded to CHUNK multiple).
        words: ``[n_ch, n_rows, U_PAD, 128]`` lane-expanded word table
            (``batch_runtime._kernel_word_table`` / :func:`wtab_geometry`).
        fb_q, phic_q: ``[n_ch, n_q]`` per-ms code/carrier phase anchors.
        scalars: ``[n_ch, 8]`` per-channel (omega, code_step, ...).

    Returns ``[n_ch, 6, n_win_pad]`` float32 INCLUSIVE prefixes:
    ``out[..., i]`` = sum of the stream over samples [0, i].
    """
    n_ch = words.shape[0]
    w_rows, u_pad, w_lanes = words.shape[1], words.shape[2], words.shape[3]
    n_streams = 2 * len(spacings)
    n_win_pad = window_re.shape[0]
    rows = chunk // 128
    assert n_win_pad % (super_n * chunk) == 0, n_win_pad
    n_super = n_win_pad // (super_n * chunk)
    win2 = window_re.reshape(n_super, super_n, rows, 128)
    win2i = window_im.reshape(n_super, super_n, rows, 128)

    kern = functools.partial(
        _kernel, spacings, spms, n_q, local, step0, gsize, chunk, super_n,
        n_win, shifts,
    )
    in_specs = [
        pl.BlockSpec((n_ch, 8), lambda k, c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_ch, n_q), lambda k, c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_ch, n_q), lambda k, c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, super_n, rows, 128), lambda k, c: (k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, super_n, rows, 128), lambda k, c: (k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w_rows, u_pad, w_lanes),
                     lambda k, c: (c, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kern,
        grid=(n_super, n_ch),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_streams, super_n * chunk),
                               lambda k, c: (c, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ch, n_streams, n_win_pad),
                                       jnp.float32),
        scratch_shapes=[pltpu.SMEM((n_ch, 16), jnp.float32)],
        interpret=interpret,
    )(scalars, fb_q, phic_q, win2, win2i, words)
