"""Worker process for tests/test_distributed.py.

Each of the two processes owns 2 virtual CPU devices and half the channels;
together they form a 4-device global ``ch`` mesh via
``jax.distributed.initialize`` — the real multi-process path (coordinator
handshake, cross-process global arrays) that a single-process virtual mesh
cannot exercise. (SURVEY §4 "multi-host tests via jax multiprocess
simulation"; BASELINE "linear to 2 hosts". Reference analog being replaced:
the process pool + shared memory of
``/root/reference/sydr/channel/channelManager.py:54-127``.)

Usage: python _distributed_worker.py <coordinator_port> <process_id>
Prints "WORKER_OK <process_id>" on success.
"""

import dataclasses
import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sydr_tpu.channels import batch_runtime as br  # noqa: E402
from sydr_tpu.channels.runtime import TrackingConfig  # noqa: E402
from sydr_tpu.channels.state import MODE_TRACKING, init_state  # noqa: E402
from sydr_tpu.parallel import distributed as dist  # noqa: E402
from sydr_tpu.parallel import mesh as pmesh  # noqa: E402
from sydr_tpu.signal.synthetic import IQGenerator  # noqa: E402

N_PROC = 2

dist.initialize(coordinator=f"localhost:{port}", num_processes=N_PROC,
                process_id=pid)
assert jax.process_count() == N_PROC, jax.process_count()
assert len(jax.local_devices()) == 2
assert jax.device_count() == 4

FS = 2e6
N_CH = 4
PRNS = [5, 12, 21, 29]
DOPS = [1200.0, -2600.0, 3900.0, 700.0]

gen = IQGenerator(FS, noise=True, seed=7)
for prn, dop in zip(PRNS, DOPS):
    gen.add_satellite(prn, doppler_hz=dop, code_phase_chips=100.0,
                      cn0_dbhz=48.0)
iq = gen.generate_ms(9)
wre_np = np.float32(iq.real)
wim_np = np.float32(iq.imag)

spms = round(FS * 1e-3)
cfg = TrackingConfig(sampling_frequency=FS, block_ms=5, tail_ms=4,
                     window_size=spms + 240, runtime="batch")

state = init_state(N_CH)
state = dataclasses.replace(
    state,
    mode=jnp.full((N_CH,), MODE_TRACKING, jnp.int32),
    carrier_freq=jnp.asarray(np.float32(DOPS)),
    rem_code=jnp.asarray(np.float32([0.02, 0.7, 0.4, 0.9])),
    rem_carrier=jnp.asarray(np.float32([0.3, 2.1, 5.0, 1.0])),
    code_freq_offset=jnp.asarray(np.float32([0.5, -1.2, 2.0, -0.4])),
    unread=jnp.asarray(np.int32(
        [int(1.1 * spms), int(1.4 * spms), int(1.2345 * spms),
         int(1.3 * spms)])),
)
bits3x_np = br.tiled_code_bits(PRNS)

# --- Single-process reference on THIS host (channel-elementwise runtime:
# sharding must be bit-identical) --------------------------------------
st_ref, out_ref = br.run_block_batched(
    cfg, jnp.asarray(bits3x_np), state, jnp.asarray(wre_np),
    jnp.asarray(wim_np))
ref = {k: np.asarray(v) for k, v in out_ref.items()}

# --- Distributed run: this process contributes only ITS channel rows ---
mesh = dist.global_mesh(("ch",))
lo, hi = pid * (N_CH // N_PROC), (pid + 1) * (N_CH // N_PROC)

state_local = jax.tree_util.tree_map(lambda x: np.asarray(x)[lo:hi], state)
state_g = jax.tree_util.tree_map(
    lambda x: dist.shard_from_hosts(mesh, "ch", x), state_local)
bits3x_g = dist.shard_from_hosts(mesh, "ch", bits3x_np[lo:hi])
wre_g = dist.replicate_from_host(mesh, wre_np)
wim_g = dist.replicate_from_host(mesh, wim_np)

step = pmesh.make_sharded_batch_step(cfg, mesh)
st_g, out_g = step(bits3x_g, state_g, wre_g, wim_g)

# Compare this process's addressable output shards against the reference
# rows it owns (outputs are [block_ms, n_ch], channel-sharded on axis 1).
# Integer outputs must be exact; float outputs are near-exact (the 2-channel
# per-shard executable compiles with different f32 FMA reassociation than
# the 4-channel unsharded one — observed max rel diff ~3e-6).
for key, arr in out_g.items():
    shards = sorted(arr.addressable_shards, key=lambda s: s.index[1].start)
    got = np.concatenate([np.asarray(s.data) for s in shards], axis=1)
    want = ref[key][:, lo:hi]
    if got.dtype.kind == "f":
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3,
                                   err_msg=key)
    else:
        np.testing.assert_array_equal(got, want, err_msg=key)

# New state must also match on the owned rows (sample accounting exact).
for name, exact in (("carrier_freq", False), ("rem_code", False),
                    ("rem_carrier", False), ("unread", True)):
    arr = getattr(st_g, name)
    shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start)
    got = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    want = np.asarray(getattr(st_ref, name))[lo:hi]
    if exact:
        np.testing.assert_array_equal(got, want, err_msg=name)
    else:
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4,
                                   err_msg=name)

print(f"WORKER_OK {pid}", flush=True)
