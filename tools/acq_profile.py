"""A/B the two PCPS formulations on the measurement backend.

Round-2 regression: ``acq_grid_points_per_s`` fell 322M -> 240M when
``acquire`` switched from the direct per-bin map (``pcps_map``) to the
DFT-shift-theorem map (``pcps_shift_map``) at the production 101-bin grid.
This harness times both at the bench shape so ``shift_plan`` can gate on
measured cost instead of assumed op counts.

Usage: env PYTHONPATH=/root/repo python tools/acq_profile.py
Prints one JSON line with both rates.
"""

import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

# persistent compile cache (as bench.py): the shift/fused compiles cost
# minutes over the dev tunnel per fresh process otherwise
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

FS = float(os.environ.get("BENCH_FS", "10e6"))
N_CH = int(os.environ.get("ACQ_CHANNELS", "12"))
REPS = int(os.environ.get("ACQ_REPS", "3"))


def main():
    import jax
    import jax.numpy as jnp

    from sydr_tpu.ops import acquisition as acq
    from sydr_tpu.ops import fft as mmfft

    n = int(round(FS * 1e-3))
    coher, noncoh = 5, 10
    rng = np.random.default_rng(0)
    iq_re = jax.device_put(
        rng.standard_normal((N_CH, coher * noncoh * n)).astype(np.float32))
    iq_im = jax.device_put(
        rng.standard_normal((N_CH, coher * noncoh * n)).astype(np.float32))
    k = np.stack([acq.code_fft_conj(i + 1, FS) for i in range(N_CH)])
    k_re = jax.device_put(np.float32(k.real))
    k_im = jax.device_put(np.float32(k.imag))
    bins = acq.doppler_bins(5000, 100)          # 101-bin production grid
    plans = (mmfft.make_plan(n), mmfft.make_plan(n, inverse=True))
    np.asarray(iq_im[0, :8])

    grid_points = N_CH * len(bins) * n
    out = {"n": n, "n_ch": N_CH, "n_bins": len(bins)}

    def timed(fn):
        fn()                                    # compile
        t0 = time.time()
        for _ in range(REPS):
            np.asarray(fn())                    # value fetch = fence
        return grid_points / ((time.time() - t0) / REPS)

    sp = acq.shift_plan(bins, FS, n, mode="shift")
    if sp is not None:
        phases, bin_shifts = sp

        def run_shift():
            m = acq.pcps_shift_map(
                iq_re, iq_im, k_re, k_im, plans[0], plans[1],
                sampling_frequency=FS, coherent=coher, non_coherent=noncoh,
                phases=phases, bin_shifts=bin_shifts)
            return m[:, ::17, ::997]            # small fetch, full dep

        out["shift_pts_per_s"] = round(timed(run_shift), 1)
        out["n_phases"] = len(phases)

        if "--trace" in sys.argv:
            # Per-op DEVICE durations of one shift-map acquisition
            # (trace_profile.device_ops; wall harnesses are dispatch-bound
            # on this backend). Identifies where the ~6x gap to the HBM
            # roofline sits (VERDICT round-4 item 4).
            import tempfile

            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from trace_profile import device_ops

            d = tempfile.mkdtemp()
            with jax.profiler.trace(d):
                np.asarray(run_shift())
            ops, wrappers = device_ops(d)
            total = sum(ms for _, ms in ops)
            print(f"--- shift-map device ops (total {total:.1f} ms, "
                  f"{grid_points / total * 1e3 / 1e6:.0f}M pts/s "
                  f"device-bound) ---")
            for name, ms in ops[:18]:
                print(f"  {ms:7.2f} ms  {name[:110]}")
            out["trace_device_ms"] = round(total, 2)
            if "--trace-only" in sys.argv:
                print(json.dumps(out))
                return

        plans16 = (mmfft.make_plan(n, matmul_dtype=jnp.bfloat16),
                   mmfft.make_plan(n, inverse=True,
                                   matmul_dtype=jnp.bfloat16))

        def run_shift16():
            m = acq.pcps_shift_map(
                iq_re, iq_im, k_re, k_im, plans16[0], plans16[1],
                sampling_frequency=FS, coherent=coher, non_coherent=noncoh,
                phases=phases, bin_shifts=bin_shifts)
            return m[:, ::17, ::997]

        out["shift_bf16_pts_per_s"] = round(timed(run_shift16), 1)

        def run_fused():
            m = acq.pcps_shift_map_fused(
                iq_re, iq_im, k_re, k_im, plans[0], plans[1],
                sampling_frequency=FS, coherent=coher, non_coherent=noncoh,
                phases=phases, bin_shifts=bin_shifts,
                interpret=jax.default_backend() == "cpu")
            return m[:, ::17, ::997]

        out["fused_pts_per_s"] = round(timed(run_fused), 1)

    pad = (-len(bins)) % 4
    bins_p = jnp.asarray(np.concatenate([bins, np.repeat(bins[-1:], pad)]))

    def run_direct():
        m = acq.pcps_map(
            iq_re, iq_im, k_re, k_im, bins_p, plans[0], plans[1],
            sampling_frequency=FS, coherent=coher, non_coherent=noncoh,
            doppler_chunk=4)
        return m[:, ::17, ::997]

    out["direct_pts_per_s"] = round(timed(run_direct), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
