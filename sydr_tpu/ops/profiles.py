"""Tracking-loop profiles: per-epoch discriminator/filter/lock updates.

One vectorised update function shared by the scanned runtime
(``channels.runtime``) and the batched runtime (``channels.batch_runtime``):

* ``borre``  — NNEML DLL + Costas PLL, each through the Borre PI filter
  (reference ``channel_l1ca_borre.py:382-396``). 3 correlators.
* ``kaplan`` — FLL-assisted-PLL carrier loop (Kaplan 2006 DLF) with a
  PULL_IN -> WIDE_TRACK -> NARROW_TRACK lock-state machine driven by the
  FLL/PLL lock indicators, per-state bandwidths, and wide/narrow correlator
  pairs (reference ``channel_l1ca_kaplan.py:434-619``). 5 correlators
  (wide E, narrow E, P, narrow L, wide L); the discriminator pair is chosen
  by the current lock state.

All inputs/outputs are ``[n_ch]`` float32/int32 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from sydr_tpu.constants import (
    DLF_A2,
    DLF_A3,
    DLF_B3,
    DLF_W0_SCALE_1ST,
    DLF_W0_SCALE_2ND,
    DLF_W0_SCALE_3RD,
)
from sydr_tpu.ops import tracking as trk

LOCK_PULL_IN = 0
LOCK_WIDE = 1
LOCK_NARROW = 2


def spacings_for(cfg) -> tuple:
    """Correlator spacings [chips], optionally sample-quantised.

    With ``cfg.quantize_spacing`` each spacing becomes ``k * step0`` for
    integer ``k`` (``step0`` = chips per sample): correlator taps are then
    integer sample lags of one chip stream — hardware-correlator semantics —
    and E/L stay symmetric about the (exactly zero) prompt.
    """
    if cfg.profile == "kaplan":
        w, n = cfg.spacing_wide, cfg.spacing_narrow
        if getattr(cfg, "kaplan_narrow_only", False):
            sp = (-n, 0.0, n)      # cruise shape: 3 taps, 6 streams
        else:
            sp = (-w, -n, 0.0, n, w)
    else:
        sp = tuple(cfg.spacings)
    if getattr(cfg, "quantize_spacing", False):
        from sydr_tpu.constants import GPS_L1CA_CODE_FREQ

        step0 = GPS_L1CA_CODE_FREQ / cfg.sampling_frequency
        # A nonzero requested spacing must never quantise to the prompt
        # tap: at 2.44 samples/chip (10 Msps decimate-4) the Kaplan
        # narrow spacing 0.2 chips is 0.49 samples and plain rounding
        # made E == P == L — the NNEML discriminator then reads exactly 0
        # and the DLL freewheels on the stale code_freq_offset
        # (~0.25 chips/s of drift in the round-4 seed-7 soak, collapsing
        # every channel that dwelt in NARROW_TRACK). Clamp to >= 1 sample
        # (the finest tap the sample rate can express; wide and narrow
        # may then coincide, which is benign — the pairs are identical).
        sp = tuple(
            0.0 if s == 0.0 else
            max(1, abs(round(s / step0))) * (1 if s > 0 else -1) * step0
            for s in sp)
    return sp


def spacing_shifts(cfg):
    """(base_spacing, per-spacing integer sample shifts) or ``None``.

    Only defined under ``quantize_spacing``: every spacing is
    ``base + shift * step0`` with ``shift >= 0`` integer, so all correlator
    chip streams are forward sample-shifts of the single base stream.
    """
    if not getattr(cfg, "quantize_spacing", False):
        return None
    from sydr_tpu.constants import GPS_L1CA_CODE_FREQ

    step0 = GPS_L1CA_CODE_FREQ / cfg.sampling_frequency
    sp = spacings_for(cfg)
    base = sp[0]
    shifts = tuple(int(round((s - base) / step0)) for s in sp)
    return base, shifts


def loop_update(cfg, corr, st, active, comp=None):
    """One per-epoch loop update across channels.

    Args:
        cfg: TrackingConfig.
        corr: ``[n_ch, 2 * n_spacings]`` correlators (i, q per spacing).
        st: object with fields dll_memory, pll_memory, fll_vel,
            i_prompt_prev, q_prompt_prev, pll_lock, fll_lock, lock_state,
            code_counter (read-only here).
        active: ``[n_ch]`` bool.
        comp: optional virtual-NCO compensation dict with keys
            ``freq`` [Hz], ``phase`` [cycles], ``code`` [chips] — subtracted
            from the raw discriminators. Used by the batched runtime, whose
            NCOs are frozen within a block: the raw discriminators keep
            measuring the full error, so the already-applied (virtual)
            corrections must be removed or the integrators wind up.

    Returns dict with: i_early..q_late (selected pair), code_err, phase_err,
    freq_err, nco_code, nco_carrier, fll_vel, pll_lock, fll_lock,
    lock_state.
    """
    if cfg.profile == "kaplan" and getattr(cfg, "kaplan_narrow_only", False):
        # cruise shape: one (narrow) pair only — no per-state tap select
        i_e, q_e = corr[:, 0], corr[:, 1]
        i_p, q_p = corr[:, 2], corr[:, 3]
        i_l, q_l = corr[:, 4], corr[:, 5]
    elif cfg.profile == "kaplan":
        i_e_w, q_e_w = corr[:, 0], corr[:, 1]
        i_e_n, q_e_n = corr[:, 2], corr[:, 3]
        i_p, q_p = corr[:, 4], corr[:, 5]
        i_l_n, q_l_n = corr[:, 6], corr[:, 7]
        i_l_w, q_l_w = corr[:, 8], corr[:, 9]
        narrow = st.lock_state == LOCK_NARROW
        i_e = jnp.where(narrow, i_e_n, i_e_w)
        q_e = jnp.where(narrow, q_e_n, q_e_w)
        i_l = jnp.where(narrow, i_l_n, i_l_w)
        q_l = jnp.where(narrow, q_l_n, q_l_w)
    else:
        i_e, q_e = corr[:, 0], corr[:, 1]
        i_p, q_p = corr[:, 2], corr[:, 3]
        i_l, q_l = corr[:, 4], corr[:, 5]

    # --- DLL (shared): NNEML + Borre PI filter -----------------------------
    dll_t1, dll_t2 = trk.loop_filter_taus(
        cfg.dll_bandwidth, cfg.dll_damping, cfg.dll_gain)
    code_err = trk.dll_nneml(i_e, q_e, i_l, q_l)
    if comp is not None:
        code_err = code_err - comp["code"]
    nco_code = trk.borre_loop_filter(
        code_err, st.dll_memory, dll_t1, dll_t2, cfg.dll_pdi)

    if cfg.profile == "kaplan":
        narrow_only = getattr(cfg, "kaplan_narrow_only", False)
        if narrow_only:
            # cruise shape: the state machine is PINNED to NARROW_TRACK
            # (no wide taps exist to fall back to; a genuinely lost
            # channel is the receiver-level monitors' job) — the per-
            # state bandwidth selects and transition logic drop out of
            # the per-epoch chain.
            pull_in = jnp.zeros_like(st.lock_state, dtype=bool)
        else:
            pull_in = st.lock_state == LOCK_PULL_IN
        fll_disc = (trk.fll_atan2 if cfg.fll_discriminator == "atan2"
                    else trk.fll_atan)
        freq_err = jnp.where(
            st.code_counter > 1,
            fll_disc(i_p, q_p, st.i_prompt_prev, st.q_prompt_prev, 1e-3),
            0.0,
        )
        phase_err = jnp.where(pull_in, 0.0, trk.pll_costas(i_p, q_p))
        if comp is not None:
            freq_err = jnp.where(st.code_counter > 1,
                                 freq_err - comp["freq"], 0.0)
            phase_err = jnp.where(pull_in, 0.0, phase_err - comp["phase"])

        # Delayed-feedback gain scheduling: the batched runtime applies
        # corrections once per block, so loop_bandwidth * block_length must
        # stay below ~0.12 for stability (and the linear virtual-NCO
        # compensation assumes sub-saturation discriminator excursions).
        if cfg.runtime == "batch":
            cap = 0.12 / (cfg.block_ms * 1e-3)
        else:
            cap = float("inf")
        if narrow_only:
            fll_bw = jnp.full_like(
                st.fll_vel, min(cfg.fll_bandwidth_narrow, cap))
            pll_bw = jnp.full_like(
                st.fll_vel, min(cfg.pll_bandwidth_narrow, cap))
        else:
            fll_bw = jnp.select(
                [st.lock_state == LOCK_NARROW, st.lock_state == LOCK_WIDE],
                [min(cfg.fll_bandwidth_narrow, cap),
                 min(cfg.fll_bandwidth_wide, cap)],
                min(cfg.fll_bandwidth_pullin, cap),
            )
            pll_bw = jnp.select(
                [st.lock_state == LOCK_NARROW, st.lock_state == LOCK_WIDE],
                [min(cfg.pll_bandwidth_narrow, cap),
                 min(cfg.pll_bandwidth_wide, cap)],
                0.0,
            )
        if cfg.dlf_order == 3:
            nco_carrier, fll_vel, fll_acc = trk.fll_assisted_pll_3rd(
                phase_err, freq_err,
                fll_bw / DLF_W0_SCALE_2ND, pll_bw / DLF_W0_SCALE_3RD,
                DLF_A2, DLF_A3, DLF_B3, 1e-3, st.fll_vel, st.fll_acc,
            )
            fll_acc = jnp.where(active, fll_acc, st.fll_acc)
        else:
            nco_carrier, fll_vel = trk.fll_assisted_pll_2nd(
                phase_err, freq_err,
                fll_bw / DLF_W0_SCALE_1ST, pll_bw / DLF_W0_SCALE_2ND,
                DLF_A2, 1e-3, st.fll_vel,
            )
            fll_acc = st.fll_acc
        fll_vel = jnp.where(active, fll_vel, st.fll_vel)

        alpha = cfg.lock_indicator_alpha
        fll_lock = jnp.where(
            active,
            trk.fll_lock_indicator(i_p, q_p, st.i_prompt_prev,
                                   st.q_prompt_prev, st.fll_lock,
                                   alpha=alpha),
            st.fll_lock)
        pll_lock = jnp.where(
            active & ~pull_in,
            trk.pll_lock_indicator(i_p, q_p, st.pll_lock, alpha=alpha),
            st.pll_lock)

        if narrow_only:
            lock_state = jnp.where(active, LOCK_NARROW, st.lock_state)
        else:
            # State machine (reference trackingStateUpdate :538-619).
            to_narrow = (
                (st.lock_state != LOCK_NARROW)
                & (fll_lock >= cfg.fll_threshold_narrow)
                & (pll_lock >= cfg.pll_threshold_narrow)
            )
            to_wide = (
                ~to_narrow
                & (st.lock_state != LOCK_WIDE)
                & (fll_lock >= cfg.fll_threshold_wide)
                & (fll_lock < cfg.fll_threshold_narrow)
            )
            to_pullin = (
                ~to_narrow & ~to_wide
                & (st.lock_state != LOCK_PULL_IN)
                & (fll_lock <= cfg.fll_threshold_wide)
            )
            lock_state = jnp.where(
                active,
                jnp.where(to_narrow, LOCK_NARROW,
                          jnp.where(to_wide, LOCK_WIDE,
                                    jnp.where(to_pullin, LOCK_PULL_IN,
                                              st.lock_state))),
                st.lock_state,
            )
    else:
        # NOTE (round 5): under 20 ms delayed block feedback the borre
        # Costas loop holds metastable ALIAS locks near k * 25 Hz (half a
        # cycle per block) on ~15% of cold-start code phases — C/N0
        # estimate -18 dB, PLL lock ~0, amplitude intact — because the
        # discriminator is sampled at the 50 Hz block rate with no
        # frequency term to break the aliasing (tools/track_benchmark.py;
        # capping the bandwidth at the kaplan branch's 0.12/block rule
        # was measured NOT to cure it). The production cruise profile is
        # therefore kaplan; the borre profile keeps its reference-faithful
        # dynamics for parity and per-ms/scan use.
        pll_t1, pll_t2 = trk.loop_filter_taus(
            cfg.pll_bandwidth, cfg.pll_damping, cfg.pll_gain)
        phase_err = trk.pll_costas(i_p, q_p)
        if comp is not None:
            phase_err = phase_err - comp["phase"]
        freq_err = jnp.zeros_like(phase_err)
        nco_carrier = trk.borre_loop_filter(
            phase_err, st.pll_memory, pll_t1, pll_t2, cfg.pll_pdi)
        fll_vel = st.fll_vel
        fll_acc = st.fll_acc
        pll_lock = jnp.where(
            active,
            trk.pll_lock_indicator(i_p, q_p, st.pll_lock),
            st.pll_lock)
        fll_lock = jnp.where(
            active,
            trk.fll_lock_indicator(i_p, q_p, st.i_prompt_prev,
                                   st.q_prompt_prev, st.fll_lock),
            st.fll_lock)
        lock_state = jnp.where(active, LOCK_NARROW, st.lock_state)

    return {
        "i_early": i_e, "q_early": q_e,
        "i_prompt": i_p, "q_prompt": q_p,
        "i_late": i_l, "q_late": q_l,
        "code_err": code_err, "phase_err": phase_err, "freq_err": freq_err,
        "nco_code": nco_code, "nco_carrier": nco_carrier,
        "fll_vel": fll_vel, "fll_acc": fll_acc,
        "pll_lock": pll_lock, "fll_lock": fll_lock,
        "lock_state": lock_state,
    }
