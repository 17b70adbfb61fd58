"""Benchmark: 32-channel GPS L1 C/A tracking real-time factor on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Primary metric: real-time factor (seconds of 10 Msps IQ signal processed per
wall second) for 32 tracking channels — the BASELINE.md target is >= 100x on
one v5e chip. ``vs_baseline`` compares against the reference design's
per-sample numpy EPL correlator (same operation count as
``sydr/dsp/tracking.py:92-116``) timed on this host's CPU for the same
32-channel workload.

Extra context fields (acquisition grid points/s, samples/s) are included in
the same JSON object.

Budget discipline (round-3 lesson: BENCH_r03.json is rc=124/parsed=null —
a benchmark that cannot finish under the driver does not exist):

  * every stage runs under one global wall-clock deadline
    (``BENCH_DEADLINE`` seconds, default 540); a stage is skipped when the
    time remaining is below its worst-case estimate, its fields stay null;
  * a watchdog thread force-emits the JSON line with whatever has
    finished if the main thread is still working near the deadline;
  * the chip-parity gate loads its CPU truth from the committed cache
    (tools/parity_truth.npz) instead of a minutes-long CPU subprocess;
  * stage order is by importance: parity gate -> decimated RTF (headline)
    -> reference CPU -> acquisition -> full-rate RTF.

The parity gate GATES: on ``parity_ok == False`` the headline value is
nulled and the process exits non-zero.
"""

import json
import os
import sys
import threading
import time

_here = os.path.dirname(os.path.abspath(
    globals().get("__file__", "/root/repo/bench.py")
))
sys.path.insert(0, _here)

# Persistent XLA compile cache: the large jit programs (superblock
# tracking, acquisition) dominate the bench wall when cold (~minutes over
# the dev tunnel). The cache dir lives in-repo (gitignored) so a bench run
# during the build round pre-warms the driver's end-of-round run.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_here, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

N_CHANNELS = int(os.environ.get("BENCH_CHANNELS", "32"))
FS = float(os.environ.get("BENCH_FS", "10e6"))
# Product-realistic loop shape: 20 ms feedback blocks, scanned into 1 s
# device dispatches (the anchor-output Pallas kernel requires
# 2*block_ms <= 128).
BLOCK_MS = int(os.environ.get("BENCH_BLOCK_MS", "20"))
# Measurement window: N_BLOCKS superblocks of signal per timed round.
# The end-of-round value fetch costs one tunnel RTT (~25-30 ms on this dev
# setup, absent on directly-attached hosts); 60 s of signal per round
# amortises it below 0.5 ms/s so the number reflects steady streaming
# (measured 20/40/60 s -> RTF 94.3/100.2/102.6; fit: 9.33 ms/s + 25.5 ms
# fixed, docs/performance.md round-3).
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", "60"))
RUNTIME = os.environ.get("BENCH_RUNTIME", "batch")  # "batch" | "scan"
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
SUPERBLOCK = int(os.environ.get("BENCH_SUPERBLOCK", "50"))
# Sample-quantised correlator taps (hardware-correlator semantics): E/L
# chips are whole-sample shifts of one base chip stream.
QUANTIZE = os.environ.get("BENCH_QUANT", "1") == "1"
# Pallas boundary extraction: "rowsum" (row-level prefix + dense XLA edge
# recompute, the production default) or "prefix" (full per-sample prefix).
BOUNDARY = os.environ.get("BENCH_BOUNDARY", "rowsum")
# Pre-correlation boxcar decimation (production receiver front-end): the
# full 10 Msps input stream is consumed on DEVICE inside the timed step
# (the boxcar sum is part of the measurement); tracking then runs at
# FS / BENCH_DECIMATE with a documented ~0.2-0.5 dB correlation-loss
# budget (tests/test_decimate.py). The undecimated RTF is also measured
# and reported alongside.
DECIMATE = int(os.environ.get("BENCH_DECIMATE", "4"))
# Pass-A epoch geometry: "scan" (recurrence) or "closed" (vectorised
# closed form; see channels/batch_runtime._pass_a_closed).
PASS_A = os.environ.get("BENCH_PASS_A", "closed")
# Loop profile of the measured cruise configuration. Production switched
# to kaplan in round 5: the borre Costas loop under 20 ms delayed block
# feedback holds metastable alias lock points at ~k*25 Hz on ~15% of
# cold-start code phases (tools/track_benchmark.py finding); the
# FLL-assisted kaplan loop at the same block shape never does, at
# negligible pass-C cost.
PROFILE = os.environ.get("BENCH_PROFILE", "kaplan")


# --------------------------------------------------------------------------
# budget framework
# --------------------------------------------------------------------------
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE", "540"))
_T0 = time.time()
_DONE = threading.Event()
RESULT: dict = {}
_BASE_FIELDS = (
    "value", "vs_baseline", "samples_per_s", "acq_grid_points_per_s",
    "reference_cpu_rtf_per_channel", "rtf_fullrate", "parity_ok",
)


def _remaining() -> float:
    return DEADLINE_S - (time.time() - _T0)


def _emit_json() -> None:
    out = {
        "metric": f"rtf_{N_CHANNELS}ch_{FS/1e6:.0f}msps",
        "unit": "x_realtime",
        "decimate": DECIMATE,
        "n_channels": N_CHANNELS,
    }
    for k in _BASE_FIELDS:
        out.setdefault(k, None)
    out.update(RESULT)
    # The parity gate gates: a failed lowering must never ship a
    # plausible RTF as the headline.
    if out.get("parity_ok") is False:
        out["value"] = None
    print(json.dumps(out), flush=True)


def _watchdog() -> None:
    slack = _remaining() - 5.0
    if slack > 0:
        _DONE.wait(slack)
    if not _DONE.is_set():
        RESULT["partial"] = True
        RESULT.setdefault("skipped", []).append("deadline")
        _emit_json()
        os._exit(4 if RESULT.get("parity_ok") is False else 0)


def _run_stage(name: str, est_s: float, fn) -> bool:
    """Run ``fn`` if the remaining budget covers ``est_s``; else skip."""
    if _remaining() < est_s:
        RESULT.setdefault("skipped", []).append(name)
        return False
    t0 = time.time()
    try:
        fn()
        return True
    except Exception as e:
        RESULT.setdefault("errors", {})[name] = (
            f"{type(e).__name__}: {str(e)[:120]}")
        return False
    finally:
        RESULT.setdefault("stage_s", {})[name] = round(time.time() - t0, 1)


def bench_tracking(decimate=1):
    import jax
    import jax.numpy as jnp

    from sydr_tpu.channels.runtime import TrackingConfig, run_block
    from sydr_tpu.channels import batch_runtime as br
    import __graft_entry__ as g

    fs_trk = FS / decimate
    cfg = TrackingConfig(
        sampling_frequency=fs_trk,
        block_ms=BLOCK_MS,
        tail_ms=4,
        window_size=int(round(fs_trk * 1e-3)) + 256,
        runtime=RUNTIME,
        use_pallas=USE_PALLAS,
        superblock=SUPERBLOCK if RUNTIME == "batch" else 1,
        quantize_spacing=QUANTIZE,
        boundary_mode=BOUNDARY,
        input_decimate=decimate,
        pass_a=PASS_A,
        profile=PROFILE,
        # the production cruise runs the narrow-only kaplan shape
        # (3 taps / 6 streams; see channels/runtime.py)
        kaplan_narrow_only=(PROFILE == "kaplan"),
    )
    codes, state, _, _ = g._tracking_inputs(cfg, N_CHANNELS)
    rng = np.random.default_rng(0)
    spms = cfg.samples_per_ms
    if RUNTIME == "batch":
        prns = [(k % 32) + 1 for k in range(N_CHANNELS)]
        bits3x = jnp.asarray(br.tiled_code_bits(prns))
        n_in = (cfg.tail_ms + cfg.superblock * cfg.block_ms) * spms
        wre_raw = jnp.asarray(
            rng.standard_normal(n_in * decimate).astype(np.float32))
        wim_raw = jnp.asarray(
            rng.standard_normal(n_in * decimate).astype(np.float32))

        # Boxcar decimation as ONE natural matmul: a naive
        # reshape(-1, D).sum(1) costs ~5.8 ms/s of device time (the 2-D
        # reshape materialises a tiled relayout of the whole stream); the
        # block-sum matmul against a [128*D, 128] 0/1 matrix reads the
        # stream once on the MXU and its output reshape is layout-free.
        # Single-pass bf16 (not HIGHEST, which is 6 bf16 passes): the 0/1
        # matrix is exact and production samples are int8-quantised
        # (integers <= 127 are exact in bf16); for f32 test noise the 2^-9
        # rounding matches the kernel's own bf16 product budget (-48 dB).
        dsum = jnp.asarray(
            (np.arange(128 * decimate)[:, None] // decimate
             == np.arange(128)[None, :]).astype(np.float32)
        ).astype(jnp.bfloat16)

        def _boxcar(x):
            padn = (-x.shape[0]) % (128 * decimate)
            if padn:
                x = jnp.concatenate([x, jnp.zeros(padn, x.dtype)])
            out = jnp.dot(
                x.reshape(-1, 128 * decimate).astype(jnp.bfloat16), dsum,
                preferred_element_type=jnp.float32).reshape(-1)
            return out[:n_in]

        @jax.jit
        def _sb(st, wre_r, wim_r):
            if decimate > 1:
                wre = _boxcar(wre_r)
                wim = _boxcar(wim_r)
            else:
                wre, wim = wre_r, wim_r
            return br.run_superblock(
                cfg, cfg.superblock, bits3x, st, wre, wim)

        if cfg.superblock > 1:
            step = lambda st: _sb(st, wre_raw, wim_raw)
        else:
            step = lambda st: br.run_block_batched(
                cfg, bits3x, st, wre_raw, wim_raw)
    else:
        n_win = cfg.window_samples
        wre = jnp.asarray(rng.standard_normal(n_win).astype(np.float32))
        wim = jnp.asarray(rng.standard_normal(n_win).astype(np.float32))
        step = lambda st: run_block(cfg, codes, st, wre, wim)

    # Warm-up / compile. NOTE: on the axon backend block_until_ready
    # returns early; a value fetch (np.asarray) is the only reliable fence.
    st, out = step(state)
    np.asarray(st.rem_code)

    # The first post-compile dispatches on the dev tunnel run ~10% slow
    # while it settles (docs/performance.md, methodology): burn a short
    # settle prefix instead of a full best-of-2 (round-3's second full
    # 60-s round helped blow the driver budget, BENCH_r03 rc=124).
    for _ in range(max(2, N_BLOCKS // 10)):
        st, out = step(st)
    np.asarray(st.rem_code)

    per_block_s = BLOCK_MS * 1e-3 * (SUPERBLOCK if RUNTIME == "batch" else 1)
    signal_s = N_BLOCKS * per_block_s
    best = None
    for _ in range(int(os.environ.get("BENCH_ROUNDS", "1"))):
        t0 = time.time()
        for _ in range(N_BLOCKS):
            st, out = step(st)
        np.asarray(st.rem_code)  # drains the queued blocks (data dep)
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)
    rtf = signal_s / best
    samples_per_s = signal_s * FS * N_CHANNELS / best
    return rtf, samples_per_s


def bench_acquisition():
    import jax

    from sydr_tpu.ops import acquisition as acq
    from sydr_tpu.ops import fft as mmfft

    n = int(round(FS * 1e-3))
    rng = np.random.default_rng(0)
    coher, noncoh = 5, 10
    n_ch = min(N_CHANNELS, 12)
    iq_re = rng.standard_normal((n_ch, coher * noncoh * n)).astype(np.float32)
    iq_im = rng.standard_normal((n_ch, coher * noncoh * n)).astype(np.float32)
    k = np.stack([acq.code_fft_conj(i + 1, FS) for i in range(n_ch)])
    bins = acq.doppler_bins(5000, 100)
    plans = (mmfft.make_plan(n), mmfft.make_plan(n, inverse=True))

    # Device-resident inputs, matching bench_tracking: this times grid
    # compute, not the dev tunnel's ~53 MB/s host link (in the receiver the
    # samples are already on device for tracking; measured 2026-08-17:
    # device 37 ms/acq vs 939 ms with per-call host upload of 48 MB).
    import jax as _jax
    iq_re, iq_im = _jax.device_put(iq_re), _jax.device_put(iq_im)
    k_re = _jax.device_put(np.float32(k.real))
    k_im = _jax.device_put(np.float32(k.imag))
    np.asarray(iq_im[0, :8])

    def run():
        d, ci, m, corr = acq.acquire(
            (iq_re, iq_im), (k_re, k_im), bins,
            sampling_frequency=FS, coherent=coher, non_coherent=noncoh,
            plans=plans,
        )
        np.asarray(m)  # value fetch: block_until_ready is unreliable here
        return m

    run()  # compile
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        run()
    wall = (time.time() - t0) / reps
    grid_points = n_ch * len(bins) * n
    return grid_points / wall


def bench_reference_cpu():
    """Reference per-channel-ms EPL rate on this host's CPU.

    Uses the ACTUAL reference implementation (``/root/reference``'s
    vectorised ``sydr.dsp.tracking.EPL``) when that checkout is present;
    otherwise a faithful numpy re-implementation of the same operation
    (``sydr/dsp/tracking.py:92-116``).
    """
    try:
        import sys as _sys

        if "/root/reference" not in _sys.path:
            _sys.path.insert(0, "/root/reference")
        from sydr.dsp.tracking import EPL as _ref_epl
        from sydr.signal.gnsssignal import GenerateGPSGoldCode

        n = int(round(FS * 1e-3))
        rng = np.random.default_rng(0)
        iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        code = GenerateGPSGoldCode(1)
        code1025 = np.r_[code[-1], code, code[0]].astype(np.float64)

        def epl_ms():
            return _ref_epl(
                rfData=iq, code=code1025, samplingFrequency=FS,
                carrierFrequency=1500.0, remainingCarrier=0.5,
                remainingCode=0.2, codeStep=1.023e6 / FS,
                correlatorsSpacing=(-0.5, 0.0, 0.5))

        epl_ms()
        t0 = time.time()
        reps = 50
        for _ in range(reps):
            epl_ms()
        return 1e-3 / ((time.time() - t0) / reps)
    except Exception:
        pass
    from sydr_tpu.signal import cacode

    n = int(round(FS * 1e-3))
    rng = np.random.default_rng(0)
    sig_re = rng.standard_normal(n)
    sig_im = rng.standard_normal(n)
    code_padded = cacode.padded_code(1).astype(np.float64)
    code_step = 1.023e6 / FS
    t = np.arange(n) / FS

    def epl_ms():
        phase = -2.0 * np.pi * 1500.0 * t + 0.5
        replica = np.exp(1j * phase)
        mixed = replica * (sig_re + 1j * sig_im)
        out = []
        for sp in (-0.5, 0.0, 0.5):
            idx = np.ceil(sp + np.arange(n) * code_step).astype(np.int64)
            chips = code_padded[np.clip(idx, 0, 1024)]
            out.append(np.sum(chips * mixed.real))
            out.append(np.sum(chips * mixed.imag))
        return out

    epl_ms()
    t0 = time.time()
    reps = 50
    for _ in range(reps):
        epl_ms()
    per_ms = (time.time() - t0) / reps
    # Reference RTF for N_CHANNELS channels, one process per channel would be
    # core-parallel; charge it the single-core rate per channel as the
    # reference does per process (optimistic for the reference: assumes
    # N_CHANNELS idle cores).
    ref_rtf = 1e-3 / per_ms
    return ref_rtf


def bench_parity():
    """Pre-measurement numeric gate: production-path chip parity.

    A silent backend change once corrupted every chip correlator while the
    bench kept reporting plausible RTF (docs/performance.md, "Chip-parity
    discipline") — so the bench now refuses to be plausible-but-corrupt:
    it runs the 4-block closed-loop superblock-wordpack parity case
    (tools/chip_parity.production_parity) on the measurement backend and
    reports parity_metric / parity_ok in the JSON line.
    """
    if os.environ.get("BENCH_PARITY", "1") != "1":
        return {"parity_ok": None}
    try:
        from tools.chip_parity import production_parity

        return production_parity()
    except Exception as e:  # parity infra failure is itself a red flag
        return {"parity_ok": False,
                "parity_error": f"{type(e).__name__}: {str(e)[:120]}"}


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    def st_parity():
        RESULT.update(bench_parity())

    def st_decimated():
        rtf, sps = bench_tracking(decimate=DECIMATE)
        # headline value: front-end boxcar decimation (the device consumes
        # the full FS stream inside the timed step; accuracy budget in
        # tests/test_decimate.py).
        RESULT["value"] = round(rtf, 3)
        RESULT["samples_per_s"] = round(sps, 1)

    def st_ref_cpu():
        RESULT["reference_cpu_rtf_per_channel"] = round(
            bench_reference_cpu(), 3)
        if RESULT.get("value"):
            RESULT["vs_baseline"] = round(
                RESULT["value"] / RESULT["reference_cpu_rtf_per_channel"], 3)

    def st_acq():
        RESULT["acq_grid_points_per_s"] = round(bench_acquisition(), 1)

    def st_fullrate():
        if DECIMATE > 1:
            RESULT["rtf_fullrate"] = round(bench_tracking(decimate=1)[0], 3)
        else:
            RESULT["rtf_fullrate"] = RESULT.get("value")

    # Worst-case stage estimates assume COLD compiles over the dev tunnel;
    # with the persistent compile cache warm they finish far faster.
    _run_stage("parity", 30.0, st_parity)
    if RESULT.get("parity_ok") is False:
        _DONE.set()
        _emit_json()
        raise SystemExit(4)
    _run_stage("tracking_decimated", 60.0, st_decimated)
    _run_stage("reference_cpu", 12.0, st_ref_cpu)
    _run_stage("acquisition", 45.0, st_acq)
    _run_stage("tracking_fullrate", 45.0, st_fullrate)
    _DONE.set()
    _emit_json()


if __name__ == "__main__":
    main()
