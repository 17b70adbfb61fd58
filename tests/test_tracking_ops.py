

def test_quantized_spacing_never_collapses_to_prompt():
    """A nonzero requested spacing must quantise to >= 1 sample: at 2.44
    samples/chip the Kaplan narrow spacing (0.2 chips = 0.49 samples)
    used to round to ZERO, making E == P == L and the NNEML
    discriminator identically zero — the DLL then freewheels on a stale
    code_freq_offset (round-4 seed-7 soak: ~0.25 chips/s drift and full
    channel collapse after a few seconds in NARROW_TRACK)."""
    from sydr_tpu.channels.runtime import TrackingConfig
    from sydr_tpu.ops import profiles as prof

    for fs in (2.5e6, 4e6, 10e6):
        cfg = TrackingConfig(sampling_frequency=fs, profile="kaplan",
                             quantize_spacing=True)
        sp = prof.spacings_for(cfg)
        step0 = 1.023e6 / fs
        for s in sp:
            if s != 0.0:
                assert abs(s) >= step0 * 0.999, (fs, sp)
        # symmetric about the prompt
        assert sp[0] == -sp[-1] and sp[1] == -sp[-2], sp
        base, shifts = prof.spacing_shifts(cfg)
        assert len(set(shifts)) >= 2
