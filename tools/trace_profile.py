"""Per-op DEVICE-time profile of the batched tracking step on the real chip.

Wall-clock harnesses lie on the axon backend (dispatch-bound, host-load
sensitive); `jax.profiler.trace` device timestamps are the only reliable
instrument (docs/performance.md, "Round-2 kernel decomposition"). This tool
runs the product-shape superblock step under a trace and aggregates per-op
device durations, normalised to milliseconds per second of processed signal.

Usage: env PYTHONPATH=/root/repo:$PYTHONPATH python tools/trace_profile.py \
           [boundary_mode ...]
"""
import os
import sys
import tempfile
import time

import numpy as np

MODES = sys.argv[1:] or ["prefix", "rowsum"]
N_CHANNELS = int(os.environ.get("BENCH_CHANNELS", "32"))
FS = float(os.environ.get("BENCH_FS", "10e6"))
BLOCK_MS = int(os.environ.get("BENCH_BLOCK_MS", "20"))
SUPERBLOCK = int(os.environ.get("BENCH_SUPERBLOCK", "50"))
QUANTIZE = os.environ.get("BENCH_QUANT", "1") == "1"
DECIMATE = int(os.environ.get("BENCH_DECIMATE", "1"))
ABLATE = os.environ.get("BENCH_ABLATE") or None


def step_fn(mode):
    import jax
    import jax.numpy as jnp

    from sydr_tpu.channels import batch_runtime as br
    from sydr_tpu.channels.runtime import TrackingConfig
    from sydr_tpu.ops import correlator_kernel as ck
    import __graft_entry__ as g

    ck._ABLATE = ABLATE
    fs_trk = FS / DECIMATE
    cfg = TrackingConfig(
        sampling_frequency=fs_trk, block_ms=BLOCK_MS, tail_ms=4,
        window_size=int(round(fs_trk * 1e-3)) + 256, runtime="batch",
        use_pallas=True, superblock=SUPERBLOCK, quantize_spacing=QUANTIZE,
        boundary_mode=mode, input_decimate=DECIMATE,
    )
    codes, state, _, _ = g._tracking_inputs(cfg, N_CHANNELS)
    rng = np.random.default_rng(0)
    spms = cfg.samples_per_ms
    prns = [(k % 32) + 1 for k in range(N_CHANNELS)]
    bits3x = jnp.asarray(br.tiled_code_bits(prns))
    n_in = (cfg.tail_ms + cfg.superblock * cfg.block_ms) * spms
    wre = jnp.asarray(
        rng.standard_normal(n_in * DECIMATE).astype(np.float32))
    wim = jnp.asarray(
        rng.standard_normal(n_in * DECIMATE).astype(np.float32))
    if DECIMATE > 1:
        # Same boxcar-matmul front-end as bench.py's production path.
        dsum = jnp.asarray(
            (np.arange(128 * DECIMATE)[:, None] // DECIMATE
             == np.arange(128)[None, :]).astype(np.float32))

        def _boxcar(x):
            padn = (-x.shape[0]) % (128 * DECIMATE)
            if padn:
                x = jnp.concatenate([x, jnp.zeros(padn, x.dtype)])
            out = jnp.dot(
                x.reshape(-1, 128 * DECIMATE), dsum,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32).reshape(-1)
            return out[:n_in]

        @jax.jit
        def _step(st, wre_r, wim_r):
            return br.run_superblock(
                cfg, cfg.superblock, bits3x, st, _boxcar(wre_r),
                _boxcar(wim_r))

        return cfg, state, lambda st: _step(st, wre, wim)
    return cfg, state, lambda st: br.run_superblock(
        cfg, cfg.superblock, bits3x, st, wre, wim)


def device_ops(trace_dir):
    """[(op_name, total_duration_ms)] summed over the device plane(s).

    Control-flow WRAPPER events (``%while...``, ``jit_...``, ``%call``,
    ``%conditional``) span their whole body, whose leaf ops are emitted as
    separate events — counting both double-counts every op inside a scan.
    (The backend started emitting these wrapper events mid-round-3; earlier
    traces had leaves only.) Wrappers are excluded from the totals and
    returned separately for context. Set TRACE_DUMP=1 to print the plane /
    line structure once for debugging.
    """
    import glob

    import jax

    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb"))
    assert paths, trace_dir
    data = jax.profiler.ProfileData.from_file(paths[-1])
    totals = {}
    wrappers = {}
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        if os.environ.get("TRACE_DUMP") == "1":
            print(f"plane: {plane.name}")
            for line in plane.lines:
                n = sum(1 for _ in line.events)
                print(f"  line: {line.name} ({n} events)")
        for line in plane.lines:
            # XLA op lines carry per-op events; steps/messages don't.
            for ev in line.events:
                ns = ev.duration_ns
                if ns <= 0:
                    continue
                name = ev.name
                is_wrapper = name.startswith(
                    ("%while", "jit_", "jit(", "%call", "%conditional"))
                d = wrappers if is_wrapper else totals
                d[name] = d.get(name, 0.0) + ns * 1e-6
    return (sorted(totals.items(), key=lambda kv: -kv[1]),
            sorted(wrappers.items(), key=lambda kv: -kv[1]))


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    for mode in MODES:
        cfg, state, step = step_fn(mode)
        st, out = step(state)            # compile + warm
        np.asarray(st.rem_code)          # fence (block_until_ready lies)
        st, out = step(st)
        np.asarray(st.rem_code)
        sig_s = SUPERBLOCK * BLOCK_MS * 1e-3
        with tempfile.TemporaryDirectory() as td:
            jax.profiler.start_trace(td)
            t0 = time.time()
            st, out = step(st)
            np.asarray(st.rem_code)
            wall = time.time() - t0
            jax.profiler.stop_trace()
            ops, wrappers = device_ops(td)
        total = sum(ms for _, ms in ops)
        print(f"\n=== boundary_mode={mode} quant={QUANTIZE} "
              f"(1 superblock = {sig_s:.1f}s signal; wall {wall:.2f}s) ===")
        print(f"device total: {total / sig_s:8.2f} ms/s "
              f"(RTF-limit {1000 * sig_s / total:6.1f})")
        for name, ms in ops[:int(os.environ.get("TRACE_TOP", "14"))]:
            print(f"  {ms / sig_s:8.2f} ms/s  {name[:90]}")
        if wrappers:
            print("  -- control-flow wrappers (span their bodies; "
                  "excluded from the total) --")
            for name, ms in wrappers[:4]:
                print(f"  {ms / sig_s:8.2f} ms/s  {name[:90]}")
        jax.clear_caches()


if __name__ == "__main__":
    main()
