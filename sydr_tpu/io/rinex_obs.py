"""RINEX 3.04 observation-file writer/reader (GPS C1C/D1C).

The reference carries a vestigial, broken observation reader
(``/root/reference/sydr/io/RINEXObs.py`` — stale import, never wired);
here observations are first-class: the receiver's pseudorange and Doppler
measurements export to standard RINEX observation files for external
processing (RTKLIB etc.), and a reader round-trips them for tests.
"""

from __future__ import annotations

import datetime as _dt

from sydr_tpu.nav.gpstime import GpsTime


def write_obs(path: str, epochs: list[dict], week: int,
              marker: str = "SYDR_TPU") -> None:
    """Write observation epochs.

    Args:
        epochs: list of {"tow": float, "obs": {prn: {"C1C": m, "D1C": Hz}}}.
        week: GPS week of the observations.
    """
    with open(path, "w") as fh:
        fh.write(
            f"{'3.04':>9}{'':11}{'OBSERVATION DATA':<20}{'G: GPS':<20}"
            f"{'RINEX VERSION / TYPE':<20}\n"
        )
        fh.write(f"{'sydr_tpu':<60}{'PGM / RUN BY / DATE':<20}\n")
        fh.write(f"{marker:<60}{'MARKER NAME':<20}\n")
        fh.write(
            f"G    2 C1C D1C{'':46}{'SYS / # / OBS TYPES':<20}\n"
        )
        fh.write(f"{'':60}{'END OF HEADER':<20}\n")
        for ep in epochs:
            t = GpsTime(week, ep["tow"]).to_datetime()
            frac = ep["tow"] % 1.0
            fh.write(
                f"> {t.year:4d} {t.month:02d} {t.day:02d} {t.hour:02d} "
                f"{t.minute:02d} {t.second + frac:11.7f}  0 "
                f"{len(ep['obs']):2d}\n"
            )
            for prn, vals in sorted(ep["obs"].items()):
                c1c = vals.get("C1C", 0.0)
                d1c = vals.get("D1C", 0.0)
                fh.write(f"G{prn:02d}{c1c:14.3f}  {d1c:14.3f}\n")


def read_obs(path: str) -> list[dict]:
    """Parse a GPS C1C/D1C observation file written by :func:`write_obs`."""
    epochs: list[dict] = []
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0
    while i < len(lines) and "END OF HEADER" not in lines[i]:
        i += 1
    i += 1
    current = None
    for line in lines[i:]:
        if line.startswith(">"):
            parts = line[1:].split()
            dt = _dt.datetime(
                int(parts[0]), int(parts[1]), int(parts[2]),
                int(parts[3]), int(parts[4]), int(float(parts[5])),
            )
            t = GpsTime.from_datetime(dt)
            tow = t.seconds + (float(parts[5]) % 1.0)
            current = {"tow": tow, "obs": {}}
            epochs.append(current)
        elif line.startswith("G") and current is not None:
            prn = int(line[1:3])
            c1c = float(line[3:17])
            d1c = float(line[19:33])
            current["obs"][prn] = {"C1C": c1c, "D1C": d1c}
    return epochs


def export_from_database(db, path: str) -> int:
    """Export the measurement table to a RINEX observation file.

    Returns the number of epochs written.
    """
    rows = db.fetch("measurement")
    week = 0  # position rows do not carry the week; callers may override
    by_tow: dict[float, dict] = {}
    for r in rows:
        ep = by_tow.setdefault(r["tow"], {})
        o = ep.setdefault(r["prn"], {})
        if r["mtype"] == "pseudorange":
            o["C1C"] = r["value"]
        elif r["mtype"] == "doppler":
            o["D1C"] = r["value"]
    epochs = [
        {"tow": tow, "obs": obs} for tow, obs in sorted(by_tow.items())
    ]
    write_obs(path, epochs, week)
    return len(epochs)
