"""Polyphase channelizer tests: tone routing, streaming continuity, and
channelizer -> RX chain end-to-end."""

import jax.numpy as jnp
import numpy as np

from t41x import constants as C
from t41x.chain import ChainSpec, RxChain
from t41x.io import signals
from t41x.mesh.channelizer import Channelizer

K = 8


def wideband_tone(freq_hz: float, n: int, fs_in: float,
                  amp: float = 1.0) -> np.ndarray:
    t = np.arange(n) / fs_in
    return (amp * np.exp(2j * np.pi * freq_hz * t)).astype(np.complex64)


def test_channelizer_routes_tones():
    cz = Channelizer(K)
    fs_in = cz.fs_in
    n = K * 4096
    # tone 5 kHz above channel 2's center, plus one in channel K-1 (=-1)
    x = (wideband_tone(2 * C.SAMPLE_RATE + 5000.0, n, fs_in)
         + wideband_tone(-1 * C.SAMPLE_RATE - 20000.0, n, fs_in, 0.5))
    st = cz.init_state()
    st, ch = cz.block(st, jnp.asarray(x))
    ch = np.asarray(ch)
    assert ch.shape == (K, n // K)
    power = (np.abs(ch) ** 2).mean(axis=1)
    # channels 2 and K-1 dominate
    top2 = set(np.argsort(power)[-2:])
    assert top2 == {2, K - 1}, power
    # in-channel frequency is the offset from the channel center
    seg = ch[2][1024:]
    f = np.angle(seg[1:] * np.conj(seg[:-1])).mean() * C.SAMPLE_RATE / (2 * np.pi)
    assert abs(f - 5000.0) < 100.0, f
    seg = ch[K - 1][1024:]
    f = np.angle(seg[1:] * np.conj(seg[:-1])).mean() * C.SAMPLE_RATE / (2 * np.pi)
    assert abs(f + 20000.0) < 100.0, f


def test_channelizer_isolation():
    cz = Channelizer(K)
    n = K * 4096
    x = wideband_tone(3 * C.SAMPLE_RATE + 10000.0, n, cz.fs_in)
    _, ch = cz.block(cz.init_state(), jnp.asarray(x))
    power = 10 * np.log10((np.abs(np.asarray(ch)) ** 2).mean(axis=1) + 1e-30)
    # neighbor channels at least 50 dB down
    others = [power[k] for k in range(K) if k not in (3,)]
    assert power[3] - max(others) > 50.0, power


def test_channelizer_streaming_continuity():
    cz = Channelizer(K)
    n = K * 8192
    x = wideband_tone(1 * C.SAMPLE_RATE + 7000.0, n, cz.fs_in)
    st = cz.init_state()
    parts = []
    half = n // 2
    for seg in (x[:half], x[half:]):
        st, ch = cz.block(st, jnp.asarray(seg))
        parts.append(np.asarray(ch))
    streamed = np.concatenate(parts, axis=-1)
    _, oneshot = cz.block(cz.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(streamed, np.asarray(oneshot),
                               rtol=1e-3, atol=1e-4)


def test_channelizer_to_rx_chain_end_to_end():
    """Wideband capture -> channelizer -> channel-batched RX chain:
    each channel's USB tone demodulates at its own audio frequency."""
    cz = Channelizer(K)
    n_blocks = 12
    n_ch_samples = n_blocks * C.BLOCK_SIZE
    n = K * n_ch_samples
    # channels 1 and 6 carry USB signals: tone at (-fs/4 + f_a) within
    # the channel
    x = (wideband_tone(1 * C.SAMPLE_RATE - 48000.0 + 800.0, n, cz.fs_in, 0.3)
         + wideband_tone((6 - K) * C.SAMPLE_RATE - 48000.0 + 1500.0, n,
                         cz.fs_in, 0.3))
    _, ch = cz.block(cz.init_state(), jnp.asarray(x))
    chain = RxChain(ChainSpec(mode="usb", interpolate_out=False))
    out = chain.run(np.asarray(ch))
    audio = np.asarray(out["audio_24k"])
    snr1 = signals.tone_fit_snr(audio[1][2048:], [800.0], C.AUDIO_RATE)
    snr6 = signals.tone_fit_snr(audio[6][2048:], [1500.0], C.AUDIO_RATE)
    assert snr1 > 25.0, snr1
    assert snr6 > 25.0, snr6
