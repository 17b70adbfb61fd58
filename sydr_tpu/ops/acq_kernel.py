"""Fused PCPS per-bin kernel: spectrum product -> idft -> |.| in VMEM.

Why this exists (round-5 chip trace, tools/acq_profile.py --trace): the
XLA form of the shift-theorem map (``ops.acquisition.pcps_shift_map``)
materializes every stage of the batched four-step inverse DFT in HBM —
``[101, 12, 100, 100]`` bf16 intermediates (~242 MB each) for the
spectrum product, both matmul stages, the twiddle and the magnitude, per
non-coherent block — ~30+ GB of traffic per acquisition, pinning the
grid at ~100-210M points/s against a ~1.2 G pts/s compute bound. This
Pallas kernel runs the whole per-(bin, channel) chain in VMEM: one
program loads the (phase, channel) spectrum slab (all non-coherent
blocks), the bin's pre-rolled code spectrum and the inverse-DFT plan
matrices, then for each non-coherent block does the complex product, the
two complex matmul stages (MXU) and the magnitude, accumulating in a
VMEM register — HBM sees only the inputs once and one [n2, n1] output
per (bin, channel).

Grid layout: bins are ordered (phase, k-shift) — ``(n_ph, k_max, n_ch)``
programs — so consecutive programs share the spectrum slab block and
Mosaic keeps it resident. The caller maps its ``bin_shifts`` onto this
grid and selects the real bins from the padded output.

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nc, kern_dtype, spec_re_ref, spec_im_ref, k_re_ref, k_im_ref,
            w2_re_ref, w2_im_ref, tw_re_ref, tw_im_ref,
            w1_re_ref, w1_im_ref, out_ref):
    kre = k_re_ref[0, 0].astype(kern_dtype)
    kim = k_im_ref[0, 0].astype(kern_dtype)
    w2r = w2_re_ref[...].astype(kern_dtype)
    w2i = w2_im_ref[...].astype(kern_dtype)
    w1r = w1_re_ref[...].astype(kern_dtype)
    w1i = w1_im_ref[...].astype(kern_dtype)
    twr = tw_re_ref[...]        # twiddle applied f32 elementwise
    twi = tw_im_ref[...]

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    acc = jnp.zeros(out_ref.shape[-2:], jnp.float32)
    for blk in range(nc):
        sre = spec_re_ref[0, 0, blk].astype(kern_dtype)
        sim = spec_im_ref[0, 0, blk].astype(kern_dtype)
        # spectrum product with the pre-rolled conj code spectrum
        pre = sre * kre - sim * kim
        pim = sre * kim + sim * kre
        # inner DFT stage: B = W2 @ P
        br = dot(w2r, pre) - dot(w2i, pim)
        bi = dot(w2r, pim) + dot(w2i, pre)
        # twiddle (f32 elementwise)
        cr = (br * twr - bi * twi).astype(kern_dtype)
        ci = (br * twi + bi * twr).astype(kern_dtype)
        # outer DFT stage: D = C @ W1  (natural [k2, k1] layout)
        dr = dot(cr, w1r) - dot(ci, w1i)
        di = dot(cr, w1i) + dot(ci, w1r)
        acc = acc + jnp.sqrt(dr * dr + di * di)
    out_ref[0, 0] = acc


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

    kern = functools.partial(_kernel, nc, kern_dtype)
    grid = (n_ph, k_max, n_ch)

    def plan_spec(shape):
        return pl.BlockSpec(shape, lambda p, ki, c: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, nc, n2, n1), lambda p, ki, c: (p, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, n2, n1), lambda p, ki, c: (p, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n2, n1),
                         lambda p, ki, c: (p * k_max + ki, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n2, n1),
                         lambda p, ki, c: (p * k_max + ki, c, 0, 0),
                         memory_space=pltpu.VMEM),
            plan_spec((n2, n2)), plan_spec((n2, n2)),   # W2
            plan_spec((n2, n1)), plan_spec((n2, n1)),   # twiddle
            plan_spec((n1, n1)), plan_spec((n1, n1)),   # W1
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n2, n1), lambda p, ki, c: (p * k_max + ki, c, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_slots, n_ch, n2, n1), jnp.float32),
        interpret=interpret,
    )(
        spec_re, spec_im, k_re_all, k_im_all,
        inv_plan.w2_re, inv_plan.w2_im, inv_plan.tw_re, inv_plan.tw_im,
        inv_plan.w1_re, inv_plan.w1_im,
    )
