"""GPS L1 C/A receiver: tracking session + decoding + measurements + PVT.

The top-level orchestrator, functionally covering the reference's
``Receiver``/``ReceiverGPSL1CA``
(``/root/reference/sydr/receiver/receiver.py:101-144``,
``receiver_gps_l1ca.py:162-381``): it feeds IQ blocks through the device
tracking runtime, decodes navigation bits on the host, forms pseudoranges at
measurement epochs, and solves least-squares PVT fixes.

Measurement formation is sample-accurate *and* sub-sample accurate — unlike
the reference, whose time-since-TOW is quantised to one sample
(``channel_l1ca_borre.py:636-654``), the transmit time here includes the
fractional code-phase remainder, giving cm-level pseudorange resolution:

    t_tx(S) = t_subframe + (n - n_sf) * 1ms + (S - p) * step/1023 * 1ms

where ``n`` counts code boundaries, ``p`` is the (fractional) sample position
of the latest boundary and ``S`` the measurement sample.
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from sydr_tpu.channels.runtime import TrackingConfig
from sydr_tpu.channels.state import MODE_TRACKING
from sydr_tpu.constants import (
    AVG_TRAVEL_TIME_MS,
    GPS_L1CA_CODE_FREQ,
    GPS_L1CA_CODE_LENGTH,
    SPEED_OF_LIGHT,
)
from sydr_tpu.decoding.lnav import LnavDecoder
from sydr_tpu.nav.ephemeris import Ephemeris
from sydr_tpu.nav.lse import PvtSolution, solve_pvt
from sydr_tpu.receiver.session import AcquisitionConfig, TrackingSession

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ReceiverConfig:
    prns: tuple
    tracking: TrackingConfig = dataclasses.field(default_factory=TrackingConfig)
    acquisition: AcquisitionConfig = dataclasses.field(
        default_factory=AcquisitionConfig
    )
    measurement_period_ms: int = 1000
    approx_position: tuple = (0.0, 0.0, 0.0)
    # Assisted mode: externally supplied ephemerides ({prn: Ephemeris}) allow
    # fixes before broadcast decode completes (reference AGNSS).
    assisted_ephemerides: dict | None = None


@dataclasses.dataclass
class PvtFix:
    tow: float                   # receiver time of fix [s of week]
    sample: int                  # absolute sample index of the epoch
    solution: PvtSolution
    n_satellites: int
    prns: tuple


class _ChannelBookkeeping:
    """Host-side per-channel decode / timing state."""

    def __init__(self, prn: int):
        self.prn = prn
        self.decoder = LnavDecoder()
        self.n_codes = 0             # code boundaries crossed while tracking
        self.bits_pushed = 0
        self.tow_ref: float | None = None   # satellite time of subframe start
        self.boundary_ref: int = 0          # n_codes at that subframe start
        self.subframes_seen: set = set()
        self.eph = None              # completed broadcast ephemeris
        self._partial = None

    def push_outputs(self, active, bit_ready, bit_ip_sum):
        """Consume one block of per-epoch outputs; returns subframe events."""
        events = []
        for e in range(len(active)):
            if not active[e]:
                continue
            self.n_codes += 1
            if bit_ready[e]:
                bit = 1 if bit_ip_sum[e] > 0 else 0
                self.bits_pushed += 1
                # NOTE: n_codes has been incremented for this epoch, which is
                # the first code period of the *next* bit; the finished bit
                # spans boundaries [n_codes - 21, n_codes - 1].
                ev = self.decoder.push_bit(bit)
                if ev is not None:
                    events.append(self._apply_subframe(ev))
        return [ev for ev in events if ev is not None]

    def _apply_subframe(self, ev):
        # Code-boundary count at the subframe's first bit start. At a
        # bit_ready epoch, n_codes includes the current epoch (ms 0 of the
        # NEXT bit); the finished bit (index bits_pushed-1) spans code
        # periods with counts [n_codes-20, n_codes-1], i.e. it starts at
        # boundary n_codes-21. Earlier bits are 20 boundaries apart.
        start_boundary = (
            self.n_codes - 1 - 20 * (self.bits_pushed - ev.bit_index)
        )
        self.tow_ref = float(ev.tow_label - 6)
        self.boundary_ref = start_boundary
        self.subframes_seen.add(ev.subframe_id)
        if ev.subframe_id in (1, 2, 3):
            if self._partial is None:
                self._partial = Ephemeris(prn=self.prn)
            self._partial.apply_subframe(ev.bits)
            if self._partial.complete:
                self.eph = self._partial
        return ev

    @property
    def has_tow(self) -> bool:
        return self.tow_ref is not None


class Receiver:
    """Streaming GPS L1 C/A receiver over the TPU channel runtime."""

    def __init__(self, cfg: ReceiverConfig):
        self.cfg = cfg
        self.session = TrackingSession(
            cfg.tracking, list(cfg.prns), cfg.acquisition
        )
        self.channels = [_ChannelBookkeeping(p) for p in cfg.prns]
        self.fixes: list[PvtFix] = []
        self.clock_tow: float | None = None   # receiver time at clock_sample
        self.clock_sample: int = 0
        self._next_meas_sample = None
        self.block_outputs: list[dict] = []
        self.keep_outputs = False

    # ------------------------------------------------------------------
    @property
    def fs(self) -> float:
        return self.cfg.tracking.sampling_frequency

    def ephemeris_for(self, i: int):
        ch = self.channels[i]
        if ch.eph is not None:
            return ch.eph
        if self.cfg.assisted_ephemerides:
            return self.cfg.assisted_ephemerides.get(ch.prn)
        return None

    # ------------------------------------------------------------------
    def process_ms(self, iq) -> None:
        """Process IQ (complex ndarray or (re, im) float32 tuple); length
        must be a whole number of blocks."""
        if isinstance(iq, tuple):
            re, im = iq
        else:
            re = np.ascontiguousarray(np.real(iq), dtype=np.float32)
            im = np.ascontiguousarray(np.imag(iq), dtype=np.float32)
        spb = self.cfg.tracking.block_ms * self.cfg.tracking.samples_per_ms
        assert len(re) % spb == 0, "feed whole blocks"
        for k in range(len(re) // spb):
            sl = slice(k * spb, (k + 1) * spb)
            out = self.session.process_block(re[sl], im[sl])
            if self.keep_outputs:
                self.block_outputs.append(out)
            for i, ch in enumerate(self.channels):
                events = ch.push_outputs(
                    out["active"][:, i], out["bit_ready"][:, i],
                    out["bit_ip_sum"][:, i],
                )
                for ev in events:
                    logger.debug(
                        "PRN %d subframe %d tow=%d", ch.prn, ev.subframe_id,
                        ev.tow_label,
                    )
            self._maybe_measure(out)

    # ------------------------------------------------------------------
    def _transmit_time_at(self, i: int, sample: int) -> float | None:
        """Satellite transmit time observed at absolute ``sample``."""
        ch = self.channels[i]
        if not ch.has_tow:
            return None
        st = self.session.state
        unread = int(st.unread[i])
        rem_code = float(st.rem_code[i])
        carrier = float(st.carrier_freq[i])
        f_if = self.cfg.tracking.intermediate_frequency
        # Effective code rate (aided; matches the runtime's rate model).
        if self.cfg.tracking.carrier_aiding:
            from sydr_tpu.constants import GPS_L1CA_CARRIER_FREQ
            delta = float(st.code_freq_offset[i]) + (carrier - f_if) * (
                GPS_L1CA_CODE_FREQ / GPS_L1CA_CARRIER_FREQ
            )
        else:
            delta = float(st.code_freq_offset[i])
        step = (GPS_L1CA_CODE_FREQ + delta) / self.fs
        # Fractional sample position of the latest code boundary.
        p = (self.session.total_samples - unread) - rem_code / step
        t_boundary = ch.tow_ref + (ch.n_codes - ch.boundary_ref) * 1e-3
        return t_boundary + (sample - p) * step / GPS_L1CA_CODE_LENGTH * 1e-3

    # ------------------------------------------------------------------
    def _maybe_measure(self, out) -> None:
        sample = self.session.total_samples
        if self._next_meas_sample is not None and sample < self._next_meas_sample:
            return

        ready = []
        for i, ch in enumerate(self.channels):
            if int(self.session.state.mode[i]) != MODE_TRACKING:
                continue
            if not ch.has_tow:
                continue
            eph = self.ephemeris_for(i)
            if eph is None:
                continue
            ready.append((i, ch, eph))
        if len(ready) < 4:
            return

        tx_times = {}
        for i, ch, eph in ready:
            tx = self._transmit_time_at(i, sample)
            if tx is not None:
                tx_times[i] = tx
        if len(tx_times) < 4:
            return

        # Receiver clock: initialise from the earliest signal + nominal
        # travel time (reference receiver_gps_l1ca.py:214-220).
        if self.clock_tow is None:
            self.clock_tow = max(tx_times.values()) + AVG_TRAVEL_TIME_MS * 1e-3
            self.clock_sample = sample
        t_rx = self.clock_tow + (sample - self.clock_sample) / self.fs

        prs, ephs, prns = [], [], []
        for i, ch, eph in ready:
            pr = (t_rx - tx_times[i]) * SPEED_OF_LIGHT
            _, _, clk = _sat_clock(eph, tx_times[i])
            # L1 single-frequency: + c*dt_sv - c*TGD (IS-GPS-200 20.3.3.3.3.2;
            # the reference *adds* TGD, receiver_gps_l1ca.py:248 — spec sign
            # used here).
            pr += clk * SPEED_OF_LIGHT - eph.tgd * SPEED_OF_LIGHT
            prs.append(pr)
            ephs.append(eph)
            prns.append(ch.prn)

        sol = solve_pvt(
            np.asarray(prs), ephs, t_rx,
            approx_position=np.asarray(self.cfg.approx_position),
        )
        period = self.cfg.measurement_period_ms * self.cfg.tracking.samples_per_ms
        self._next_meas_sample = sample + period
        if sol is None or not sol.converged:
            return
        self.fixes.append(
            PvtFix(
                tow=t_rx, sample=sample, solution=sol,
                n_satellites=len(prs), prns=tuple(prns),
            )
        )
        # Steer the receiver clock with the solved bias (reference :378).
        self.clock_tow = t_rx - sol.clock_bias_m / SPEED_OF_LIGHT
        self.clock_sample = sample
        logger.info(
            "fix @%0.3f: %s bias=%.1fm nsat=%d", t_rx,
            np.array2string(sol.position, precision=2), sol.clock_bias_m,
            len(prs),
        )


def _sat_clock(eph, t):
    from sydr_tpu.nav.kepler import satellite_position_velocity
    return satellite_position_velocity(eph, t)
