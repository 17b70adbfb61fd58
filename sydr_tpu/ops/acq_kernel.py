"""Fused PCPS per-bin kernel: spectrum product -> idft -> |.| in VMEM.

Why this exists (round-5 chip trace, tools/acq_profile.py --trace): the
XLA form of the shift-theorem map (``ops.acquisition.pcps_shift_map``)
materializes every stage of the batched four-step inverse DFT in HBM —
``[101, 12, 100, 100]`` bf16 intermediates (~242 MB each) for the
spectrum product, both matmul stages, the twiddle and the magnitude, per
non-coherent block — ~30+ GB of traffic per acquisition, pinning the
grid at ~100-220M points/s against a ~1.2 G pts/s compute bound. This
Pallas kernel runs the whole per-(bin, channel) chain in VMEM: HBM sees
the spectra once and one [n2, n1] magnitude map per (bin, channel).

Per-matmul fixed cost shapes everything on this Mosaic backend
(docs/performance.md round 1: "matmul count matters as much as FLOPs").
The first cut of this kernel did nc x 8 small [100,100] dots per program
and measured 44M pts/s — 5x SLOWER than the XLA map. The production
form batches ALL non-coherent blocks into ONE wide matmul per stage:

  * stage 1 (left-multiply) concatenates the nc spectrum-product blocks
    along columns — ``W2 @ P_cat`` keeps the block structure;
  * the twiddle applies as a pre-tiled ``[n2, nc*n1]`` elementwise map;
  * stage 2 (right-multiply) contracts against a BLOCK-DIAGONAL
    ``[nc*n1, nc*n1]`` W1 (nc x the useful MACs, still ~1 ms of MXU at
    the production shape — fixed per-matmul cost dominates small dots);
  * the non-coherent magnitude sum over blocks is one ``[nc*n1, n1]``
    0/1 segment-sum matmul (a reshape-and-reduce would relayout).

Grid order (n_ph, n_ch, k_max): consecutive programs share the (phase,
channel) spectrum slab block, so Mosaic keeps it resident across the
k-shift sweep.

Matmul precision: the backend's default single-pass bf16 in-kernel dots
are numerically fine here — acquisition is noise-dominated (the 2^-9
relative rounding sits ~-48 dB under the correlation floor) and the
non-coherent sum averages it further; the reference itself accepts a
half-spectrum approximation in its C path (acquisition.c:105-107).

Reference analog: ``sydr/dsp/acquisition.py:41-71`` / the C PCPS loop
(``sydr/c_functions/acquisition.c:109-172``) — the stage the reference
wrote native code for.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nc, kern_dtype, spec_re_ref, spec_im_ref, k_re_ref, k_im_ref,
            w2_re_ref, w2_im_ref, twc_re_ref, twc_im_ref,
            w1d_re_ref, w1d_im_ref, seg_ref, out_ref):
    n2, n1 = out_ref.shape[-2:]
    kre = k_re_ref[0, 0].astype(kern_dtype)
    kim = k_im_ref[0, 0].astype(kern_dtype)
    w2r = w2_re_ref[...].astype(kern_dtype)
    w2i = w2_im_ref[...].astype(kern_dtype)
    w1r = w1d_re_ref[...]          # block-diagonal, already kern_dtype
    w1i = w1d_im_ref[...]
    twr = twc_re_ref[...]          # tiled twiddle, f32 elementwise
    twi = twc_im_ref[...]
    seg = seg_ref[...]             # [nc*n1, n1] 0/1 segment-sum

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    # concatenate the nc spectrum blocks along columns: [n2, nc*n1]
    sre = jnp.concatenate(
        [spec_re_ref[0, 0, b] for b in range(nc)], axis=1).astype(kern_dtype)
    sim = jnp.concatenate(
        [spec_im_ref[0, 0, b] for b in range(nc)], axis=1).astype(kern_dtype)
    krec = jnp.concatenate([kre] * nc, axis=1)
    kimc = jnp.concatenate([kim] * nc, axis=1)
    # spectrum product with the pre-rolled conj code spectrum
    pre = sre * krec - sim * kimc
    pim = sre * kimc + sim * krec
    # stage 1: B_cat = W2 @ P_cat  (block structure preserved)
    br = dot(w2r, pre) - dot(w2i, pim)
    bi = dot(w2r, pim) + dot(w2i, pre)
    # twiddle (f32), cast back for the MXU
    cr = (br * twr - bi * twi).astype(kern_dtype)
    ci = (br * twi + bi * twr).astype(kern_dtype)
    # stage 2: D_cat = C_cat @ blockdiag(W1)
    dr = dot(cr, w1r) - dot(ci, w1i)
    di = dot(cr, w1i) + dot(ci, w1r)
    # non-coherent |.| sum over blocks: one 0/1 segment-sum matmul
    mag = jnp.sqrt(dr * dr + di * di).astype(kern_dtype)
    out_ref[0, 0] = dot(mag, seg)


@functools.partial(
    jax.jit,
    static_argnames=("non_coherent", "interpret", "kern_dtype"))
def pcps_fused_bins(
    spec_re, spec_im,      # [n_ph, n_ch, nc, n2, n1] f32
    k_re_all, k_im_all,    # [n_ph * k_max, n_ch, n2, n1] f32 (pre-rolled)
    inv_plan,              # mmfft.DFTPlan (inverse=True)
    *,
    non_coherent: int,
    interpret: bool = False,
    kern_dtype=jnp.bfloat16,
):
    """Non-coherent magnitude maps for all (bin-slot, channel) pairs.

    Returns ``[n_ph * k_max, n_ch, n2, n1]`` f32 in the four-step's
    natural permuted layout (caller unpermutes once).
    """
    n_ph, n_ch, nc, n2, n1 = spec_re.shape
    n_slots = k_re_all.shape[0]
    k_max = n_slots // n_ph
    assert n_slots == n_ph * k_max, (n_slots, n_ph)
    assert nc == non_coherent

    # tiled twiddle [n2, nc*n1] (f32) and block-diagonal W1 [nc*n1, nc*n1]
    twc_re = jnp.tile(inv_plan.tw_re, (1, nc))
    twc_im = jnp.tile(inv_plan.tw_im, (1, nc))
    eye_nc = jnp.eye(nc, dtype=inv_plan.w1_re.dtype)
    w1d_re = jnp.kron(eye_nc, inv_plan.w1_re).astype(kern_dtype)
    w1d_im = jnp.kron(eye_nc, inv_plan.w1_im).astype(kern_dtype)
    seg = jnp.asarray(
        np.tile(np.eye(n1, dtype=np.float32), (nc, 1))).astype(kern_dtype)

    kern = functools.partial(_kernel, nc, kern_dtype)
    grid = (n_ph, n_ch, k_max)

    def plan_spec(shape):
        return pl.BlockSpec(shape, lambda p, c, ki: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, nc, n2, n1), lambda p, c, ki: (p, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, n2, n1), lambda p, c, ki: (p, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n2, n1),
                         lambda p, c, ki: (p * k_max + ki, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n2, n1),
                         lambda p, c, ki: (p * k_max + ki, c, 0, 0),
                         memory_space=pltpu.VMEM),
            plan_spec((n2, n2)), plan_spec((n2, n2)),           # W2
            plan_spec((n2, nc * n1)), plan_spec((n2, nc * n1)),  # twiddle
            plan_spec((nc * n1, nc * n1)),                       # W1 diag
            plan_spec((nc * n1, nc * n1)),
            plan_spec((nc * n1, n1)),                            # seg sum
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n2, n1), lambda p, c, ki: (p * k_max + ki, c, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_slots, n_ch, n2, n1), jnp.float32),
        interpret=interpret,
    )(
        spec_re, spec_im, k_re_all, k_im_all,
        inv_plan.w2_re, inv_plan.w2_im, twc_re, twc_im,
        w1d_re, w1d_im, seg,
    )
