"""Live terminal dashboard (ANSI, dependency-free).

Covers the reference's enlighten status-bar GUI
(``/root/reference/sydr/enlightengui.py``): one line per channel with
state, C/N0, Doppler, flags and TOW, plus a receiver status line with the
latest fix — redrawn in place each block.
"""

from __future__ import annotations

import sys

from sydr_tpu.channels.state import (
    FLAG_BIT_SYNC,
    FLAG_CODE_LOCK,
    MODE_ACQUIRING,
    MODE_IDLE,
    MODE_TRACKING,
)

_MODE_NAMES = {MODE_IDLE: "IDLE", MODE_ACQUIRING: "ACQ ",
               MODE_TRACKING: "TRCK"}
_CSI = "\x1b["


class Dashboard:
    def __init__(self, receiver, stream=None, enabled=True):
        self.rx = receiver
        self.stream = stream or sys.stderr
        self.enabled = enabled and self.stream.isatty()
        self._lines = 0

    def _flag_str(self, flags: int, ch) -> str:
        parts = []
        parts.append("C" if flags & FLAG_CODE_LOCK else "-")
        parts.append("B" if flags & FLAG_BIT_SYNC else "-")
        parts.append("S" if ch.decoder.subframe_sync else "-")
        parts.append("T" if ch.has_tow else "-")
        parts.append("E" if ch.eph is not None else "-")
        return "".join(parts)

    def update(self, out) -> None:
        if not self.enabled:
            return
        rx = self.rx
        lines = []
        processed_s = rx.session.total_samples / rx.fs
        header = f" sydr_tpu | signal {processed_s:8.1f} s"
        if rx.fixes:
            f = rx.fixes[-1]
            p = f.solution.position
            header += (
                f" | fix ({p[0]:11.1f} {p[1]:11.1f} {p[2]:11.1f})"
                f" nsat={f.n_satellites} gdop={f.solution.gdop:.1f}"
            )
        else:
            header += " | no fix yet"
        lines.append(header)
        for i, ch in enumerate(rx.channels):
            mode = _MODE_NAMES.get(int(rx.session.mode_host[i]), "?")
            cn0 = float(out["cn0"][-1, i])
            dop = float(out["carrier_freq"][-1, i]) \
                - rx.cfg.tracking.intermediate_frequency
            flags = int(out["flags"][-1, i])
            tow = f"{ch.tow_ref:.0f}" if ch.has_tow else "-"
            lines.append(
                f"  G{ch.prn:02d} [{mode}] C/N0 {cn0:5.1f} dB-Hz "
                f"dop {dop:+7.0f} Hz [{self._flag_str(flags, ch)}] "
                f"TOW {tow}"
            )

        out_s = ""
        if self._lines:
            out_s += f"{_CSI}{self._lines}F{_CSI}J"
        out_s += "\n".join(lines) + "\n"
        self.stream.write(out_s)
        self.stream.flush()
        self._lines = len(lines)

    def close(self) -> None:
        if self.enabled:
            self.stream.write("\n")
            self.stream.flush()
