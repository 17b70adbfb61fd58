"""PCPS (Parallel Code Phase Search) acquisition as batched XLA FFT kernels.

TPU-native reformulation of the reference acquisition stage
(``/root/reference/sydr/dsp/acquisition.py:9-115`` and the C variant
``c_functions/acquisition.c:109-172``): instead of a per-channel Python loop
over Doppler bins, the whole (channel x Doppler x non-coherent x coherent)
grid is evaluated with batched ``jnp.fft`` calls inside one jitted function,
scanning over Doppler chunks to bound peak HBM usage.

Sign conventions are direct (unlike the reference, which negates the bin at
readout, ``channel_l1ca_borre.py:302``): bin ``d`` wipes a carrier at
``f_if + d`` and the returned Doppler is the bin value itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sydr_tpu.signal import cacode


def doppler_bins(doppler_range: float, doppler_step: float) -> np.ndarray:
    """Doppler search bins: -range .. +range inclusive."""
    return np.arange(-doppler_range, doppler_range + 1, doppler_step).astype(
        np.float32
    )


def code_fft_conj(prn: int, sampling_frequency: float) -> np.ndarray:
    """conj(FFT(upsampled C/A code)) for circular correlation, complex64."""
    code = cacode.upsample_code(cacode.ca_code(prn), sampling_frequency)
    return np.conj(np.fft.fft(code.astype(np.float64))).astype(np.complex64)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sampling_frequency",
        "intermediate_frequency",
        "coherent",
        "non_coherent",
        "doppler_chunk",
    ),
)
def pcps_map(
    iq: jax.Array,
    code_ffts: jax.Array,
    bins: jax.Array,
    *,
    sampling_frequency: float,
    intermediate_frequency: float = 0.0,
    coherent: int = 5,
    non_coherent: int = 10,
    doppler_chunk: int = 4,
) -> jax.Array:
    """Correlation maps for a batch of channels.

    Args:
        iq: ``[n_ch, non_coherent * coherent * n]`` complex64 samples.
        code_ffts: ``[n_ch, n]`` complex64, conj(FFT(code replica)).
        bins: ``[n_dop]`` float32 Doppler bins (pad to a multiple of
            ``doppler_chunk``; padded bins produce extra rows to discard).

    Returns:
        ``[n_ch, n_dop, n]`` float32 correlation map (n_dop includes padding).
    """
    n_ch, n = code_ffts.shape
    n_dop = bins.shape[0]
    assert n_dop % doppler_chunk == 0, "pad bins to a multiple of doppler_chunk"

    # [n_ch, non_coherent, coherent, n]
    blocks = iq.reshape(n_ch, non_coherent, coherent, n)

    # Carrier phase restarts at each non-coherent block (reference semantics:
    # one carrier vector of length coherent*n reused per block,
    # dsp/acquisition.py:33,45-53).
    t = (jnp.arange(coherent * n, dtype=jnp.float32) / sampling_frequency).reshape(
        coherent, n
    )

    def one_chunk(chunk_bins):
        # chunk_bins: [doppler_chunk]
        freqs = intermediate_frequency + chunk_bins  # [dc]
        phase = -2.0 * jnp.pi * freqs[:, None, None] * t[None]  # [dc, coh, n]
        carrier = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        mixed = blocks[None] * carrier[:, None, None]  # [dc, ch, nc, coh, n]
        spec = jnp.fft.fft(mixed, axis=-1)
        corr = jnp.fft.ifft(spec * code_ffts[None, :, None, None], axis=-1)
        coh_sum = jnp.sum(corr, axis=3)  # [dc, ch, nc, n]
        noncoh = jnp.sum(jnp.abs(coh_sum), axis=2)  # [dc, ch, n]
        return noncoh.astype(jnp.float32)

    chunked = bins.reshape(n_dop // doppler_chunk, doppler_chunk)
    maps = jax.lax.map(one_chunk, chunked)  # [n_chunks, dc, ch, n]
    return maps.reshape(n_dop, n_ch, n).transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnames=("samples_per_chip",))
def peak_metric(corr_map: jax.Array, bins: jax.Array, *, samples_per_chip: int):
    """Two-peak comparison metric per channel.

    Mirrors ``TwoCorrelationPeakComparison`` (reference
    ``dsp/acquisition.py:78-115``): highest peak over the (Doppler x code)
    map, second peak taken on the same Doppler row with +/-1 chip of code
    phases around the main peak excluded (non-circular exclusion, matching
    the reference).

    Returns (doppler_hz [n_ch], code_index [n_ch] int32, metric [n_ch]).
    """
    n_ch, n_dop, n = corr_map.shape
    flat_idx = jnp.argmax(corr_map.reshape(n_ch, -1), axis=-1)
    fi = flat_idx // n
    ci = flat_idx % n
    peak1 = jnp.max(corr_map.reshape(n_ch, -1), axis=-1)

    rows = jnp.take_along_axis(corr_map, fi[:, None, None], axis=1)[:, 0, :]
    idx = jnp.arange(n)[None, :]
    excluded = (idx > ci[:, None] - samples_per_chip) & (
        idx < ci[:, None] + samples_per_chip
    )
    peak2 = jnp.max(jnp.where(excluded, -jnp.inf, rows), axis=-1)

    doppler = bins[fi]
    metric = peak1 / peak2
    return doppler, ci.astype(jnp.int32), metric


def acquire(
    iq,
    code_ffts,
    bins,
    *,
    sampling_frequency: float,
    intermediate_frequency: float = 0.0,
    coherent: int = 5,
    non_coherent: int = 10,
    doppler_chunk: int = 4,
):
    """Full PCPS acquisition: map + peak metric.

    ``bins`` may have any length; it is padded internally to a multiple of
    ``doppler_chunk`` with duplicates of the last bin, and padded rows are
    dropped before peak-finding.

    Returns (doppler [n_ch], code_index [n_ch], metric [n_ch], map
    [n_ch, n_dop, n]).
    """
    bins = np.asarray(bins, dtype=np.float32)
    n_dop = len(bins)
    pad = (-n_dop) % doppler_chunk
    bins_padded = np.concatenate([bins, np.repeat(bins[-1:], pad)])
    corr = pcps_map(
        jnp.asarray(iq),
        jnp.asarray(code_ffts),
        jnp.asarray(bins_padded),
        sampling_frequency=sampling_frequency,
        intermediate_frequency=intermediate_frequency,
        coherent=coherent,
        non_coherent=non_coherent,
        doppler_chunk=doppler_chunk,
    )[:, :n_dop, :]
    samples_per_chip = round(
        sampling_frequency / 1.023e6
    )
    doppler, code_idx, metric = peak_metric(
        corr, jnp.asarray(bins), samples_per_chip=samples_per_chip
    )
    return doppler, code_idx, metric, corr
