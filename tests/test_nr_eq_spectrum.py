"""Behavioral tests for noise reduction, EQ, and zoom spectrum."""

import jax.numpy as jnp
import numpy as np

from t41x import constants as C
from t41x.dsp import eq, nr, spectrum
from t41x.io import signals

RATE = C.AUDIO_RATE


def tone_noise(freq, n, snr_amp=0.3, seed=0):
    t = np.arange(n) / RATE
    sig = np.sin(2 * np.pi * freq * t).astype(np.float32)
    noise = signals.awgn(n, snr_amp, seed=seed, complex_=False)
    return sig, (sig + noise).astype(np.float32)


def run_blocks(fn, state, x, block=256):
    outs = []
    for i in range(len(x) // block):
        state, y = fn(state, jnp.asarray(x[i * block:(i + 1) * block]))
        outs.append(np.asarray(y))
    return np.concatenate(outs)


def _snr(audio, freq, skip):
    return signals.tone_fit_snr(audio[skip:], [freq], RATE)


def band_power(x, f_lo, f_hi):
    spec = np.abs(np.fft.rfft(x)) ** 2
    f = np.fft.rfftfreq(len(x), 1 / RATE)
    return spec[(f >= f_lo) & (f < f_hi)].mean()


def test_kim_nr_improves_snr():
    # Kim minimum-statistics NR nulls STEADY tones by design (a constant
    # bin is indistinguishable from noise floor); use a keyed, bursty
    # tone like speech/CW
    n = 48000
    t = np.arange(n) / RATE
    # ~8 Hz keying: on-bursts shorter than the 80 ms min-stats window
    env = (np.sin(2 * np.pi * 8.0 * t) > 0).astype(np.float32)
    sig = env * np.sin(2 * np.pi * 800.0 * t).astype(np.float32)
    noisy = sig + signals.awgn(n, 0.25, seed=1, complex_=False)
    p = nr.kim_params()
    out = run_blocks(lambda s, x: nr.kim_nr(p, s, x), nr.kim_state(), noisy)
    out, noisy_l = out[8000:], noisy[8000:]
    # tone band survives much better than the away-from-tone noise band
    keep_sig = band_power(out, 700, 900) / band_power(noisy_l, 700, 900)
    keep_noise = band_power(out, 1500, 2500) / band_power(noisy_l, 1500, 2500)
    # Kim's published gain rule yields modest (~4 dB) selectivity on this
    # metric; assert it is clearly present
    assert 10 * np.log10(keep_sig / keep_noise) > 3.0, (keep_sig, keep_noise)


def test_spectral_nr_improves_snr():
    # speech-presence tracking absorbs STEADY tones into the noise
    # estimate (tau ~2.7 s, same equations as the reference) — use a
    # keyed signal with a noise-only lead-in, like real speech/CW
    n = 72000
    t = np.arange(n) / RATE
    env = ((t > 1.0) & (np.sin(2 * np.pi * 6.0 * t) > 0)).astype(np.float32)
    sig = env * np.sin(2 * np.pi * 700.0 * t).astype(np.float32)
    noisy = (sig + signals.awgn(n, 0.25, seed=5, complex_=False)
             ).astype(np.float32)
    p = nr.spectral_params()
    out = run_blocks(lambda s, x: nr.spectral_nr(p, s, x),
                     nr.spectral_state(), noisy)
    out_l, in_l = out[36000:], noisy[36000:]
    keep_sig = band_power(out_l, 600, 800) / band_power(in_l, 600, 800)
    keep_noise = (band_power(out_l, 1500, 2500)
                  / band_power(in_l, 1500, 2500))
    sel = 10 * np.log10(keep_sig / keep_noise)
    assert sel > 6.0, sel


def test_xanr_nr_mode_keeps_tone_drops_noise():
    n = 16384
    sig, noisy = tone_noise(600.0, n, snr_amp=0.5, seed=2)
    p = nr.XanrParams(notch=False)
    out = run_blocks(lambda s, x: nr.xanr(p, s, x), nr.xanr_state(p), noisy)
    snr_in = _snr(noisy, 600.0, 6000)
    snr_out = _snr(out, 600.0, 6000)
    assert snr_out > snr_in + 3.0, (snr_in, snr_out)


def test_xanr_notch_mode_removes_tone():
    # LMS convergence with the reference's two_mu=1e-4 takes ~2-3 s
    n = 65536
    t = np.arange(n) / RATE
    x = (np.sin(2 * np.pi * 1000.0 * t)
         + signals.awgn(n, 0.05, seed=3, complex_=False)).astype(np.float32)
    p = nr.XanrParams(notch=True)
    out = run_blocks(lambda s, x_: nr.xanr(p, s, x_), nr.xanr_state(p), x)
    def tone_pow(a):
        c = np.exp(-2j * np.pi * 1000.0 * np.arange(len(a)) / RATE)
        return abs(np.mean(a * c)) ** 2
    drop = 10 * np.log10(tone_pow(x[-16384:])
                         / (tone_pow(out[-16384:]) + 1e-30))
    assert drop > 10.0, drop


def test_eq_band_gain_controls_tone():
    d = eq.EQDesign()
    centers = eq.band_centers()
    f = float(centers[7])  # ~1 kHz
    n = 8192
    t = np.arange(n) / RATE
    x = np.sin(2 * np.pi * f * t).astype(np.float32)

    def amp(gains):
        st = d.init_state()
        _, y = d.apply(jnp.asarray(st), jnp.asarray(x), jnp.asarray(gains))
        y = np.asarray(y)[2000:]
        c = np.exp(-2j * np.pi * f * np.arange(len(y)) / RATE)
        return abs(np.mean(y * c))

    g_full = np.zeros(14, np.float32); g_full[7] = 1.0
    g_half = np.zeros(14, np.float32); g_half[7] = 0.5
    a_full, a_half = amp(g_full), amp(g_half)
    assert a_full > 0
    np.testing.assert_allclose(a_half / a_full, 0.5, rtol=0.05)

    # a tone far below all bands passes weakly even at full gain
    g_all = np.ones(14, np.float32)
    x_low = np.sin(2 * np.pi * 50.0 * t).astype(np.float32)
    st = d.init_state()
    _, y = d.apply(jnp.asarray(st), jnp.asarray(x_low), jnp.asarray(g_all))
    y = np.asarray(y)[2000:]
    c = np.exp(-2j * np.pi * 50.0 * np.arange(len(y)) / RATE)
    assert abs(np.mean(y * c)) < 0.2


def test_zoom1_spectrum_peak_bin():
    # tone at +24 kHz in the shifted 192 kHz I/Q -> bin 64 above center
    iq = signals.tone_iq(24000.0, C.BLOCK_SIZE)
    st = np.zeros(spectrum.RES, np.float32)
    _, p = spectrum.zoom1_spectrum(jnp.asarray(st), jnp.asarray(iq))
    peak = int(np.argmax(np.asarray(p)))
    expect = spectrum.RES // 2 + int(24000.0 / (C.SAMPLE_RATE / spectrum.RES))
    assert abs(peak - expect) <= 1, (peak, expect)


def test_zoomfft_resolves_fine_tone():
    z = spectrum.ZoomFFT(zoom=2)  # 48 kHz span, 512 bins
    st = z.init_state()
    iq = signals.tone_iq(5000.0, 8 * C.BLOCK_SIZE) * 0.5
    for b in range(8):
        st, p = z.block(st, jnp.asarray(
            iq[b * C.BLOCK_SIZE:(b + 1) * C.BLOCK_SIZE]))
    p = np.asarray(p)
    span = C.SAMPLE_RATE / z.factor
    expect = spectrum.RES // 2 + int(round(5000.0 / (span / spectrum.RES)))
    peak = int(np.argmax(p))
    assert abs(peak - expect) <= 2, (peak, expect)


def test_smeter_dbm_scale():
    d1 = float(spectrum.smeter_dbm(jnp.asarray(40.0)))
    d2 = float(spectrum.smeter_dbm(jnp.asarray(400.0)))
    np.testing.assert_allclose(d2 - d1, 10.0, atol=1e-4)
    # formula value with defaults: 22 + 10*log10(40) - 92 - 1.5 = -55.48
    np.testing.assert_allclose(d1, -55.48, atol=0.01)


def test_eq_matches_per_band_biquad_oracle():
    """The composed chunk-operator EQ (one matmul pair per 32-sample
    chunk) is sample-exact vs straightforward per-band df2T cascades
    (iir.biquad_apply) with the alternating signs and gains, streamed
    over blocks with carried state."""
    import jax.numpy as jnp

    from t41x.dsp import eq as eq_mod, iir

    rng = np.random.default_rng(17)
    ch, n, blocks = 3, 256, 3
    eq = eq_mod.EQDesign()
    gains = rng.random((ch, eq_mod.NUM_BANDS)).astype(np.float32)
    x = rng.standard_normal((ch, blocks * n)).astype(np.float32) * 0.3

    st = jnp.asarray(eq.init_state((ch,)))
    st_ref = np.zeros((ch, eq_mod.NUM_BANDS, eq.stages, 2), np.float32)
    signs = np.asarray([(-1.0) ** (i + 1) * -1.0
                        for i in range(eq_mod.NUM_BANDS)], np.float32)
    for bi in range(blocks):
        blk = x[:, bi * n:(bi + 1) * n]
        st, y = eq.apply(st, jnp.asarray(blk), jnp.asarray(gains))
        # oracle: each band's cascade independently
        y_ref = np.zeros_like(blk)
        new_ref = np.empty_like(st_ref)
        for b in range(eq_mod.NUM_BANDS):
            sb, yb = iir.biquad_apply(jnp.asarray(st_ref[:, b]),
                                      jnp.asarray(blk),
                                      eq.b[b], eq.a[b])
            new_ref[:, b] = np.asarray(sb)
            y_ref += signs[b] * gains[:, b:b + 1] * np.asarray(yb)
        st_ref = new_ref
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4,
                                   atol=2e-4, err_msg=f"block {bi}")
    # the EQ operator carries balanced normal-form states
    # (iir.stage_normal_form), not df2T coordinates, so states are
    # compared by EFFECT: the per-block output assertions above already
    # prove the carried state is equivalent across 3 block boundaries
