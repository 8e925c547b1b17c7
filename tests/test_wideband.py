"""Polyphase channelizer and wideband multi-illuminator pipeline."""

import numpy as np

from passiveradar_tpu.ops.channelizer import channelize, channelize_pair
from passiveradar_tpu.wideband import integrate_channels, process_wideband_frame


def _cnoise(rng, n):
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)


def test_tone_lands_in_its_channel(rng):
    k, n = 8, 8192
    fs = 8192.0
    # tone inside channel 3 at +5 Hz from the channel centre
    f0 = 3 * fs / k + 5.0
    t = np.arange(n) / fs
    x = np.exp(1j * 2 * np.pi * f0 * t).astype(np.complex64)
    ch = np.asarray(channelize(x, k))
    power = np.mean(np.abs(ch) ** 2, axis=0)
    assert np.argmax(power) == 3
    # adjacent-channel rejection > 30 dB
    assert power[3] > 1000 * np.sort(power)[-2]
    # inside the channel, the tone sits at +5 Hz of the decimated rate
    spec = np.abs(np.fft.fft(ch[64:, 3]))
    m = ch[64:, 3].shape[0]
    f_in_ch = np.argmax(spec) / m * (fs / k)
    assert abs(f_in_ch - 5.0) < 2 * (fs / k) / m


def test_channelizer_preserves_cross_channel_correlation(rng):
    """ref/srv banks are phase-matched: a delay in the wideband domain stays
    a (fractional) delay with coherent phase in every channel."""
    k, n = 4, 4096
    base = _cnoise(rng, n)
    base = np.convolve(base, np.ones(4) / 4, "same").astype(np.complex64)
    srv = np.roll(base, 8)  # 8 wideband samples = 2 channel samples
    rc, sc = channelize_pair(base, srv, k)
    rc, sc = np.asarray(rc), np.asarray(sc)
    for ch in range(k):
        r, s = rc[32:, ch], sc[32:, ch]
        lags = [np.abs(np.vdot(r[:-4], s[d:d + len(r) - 4])) for d in range(4)]
        assert np.argmax(lags) == 2


def test_wideband_pipeline_finds_target_per_channel(rng):
    k = 4
    n = 4096 * k          # per-channel 4096 samples
    fs = float(n)         # 1 s CPI → per-channel rate n/k
    t = np.arange(n) / fs
    # two "stations", one per channel 1 and 2
    s1 = np.convolve(_cnoise(rng, n), np.ones(8) / 8, "same")
    s2 = np.convolve(_cnoise(rng, n), np.ones(8) / 8, "same")
    c1 = s1 * np.exp(1j * 2 * np.pi * (1 * fs / k) * t)
    c2 = s2 * np.exp(1j * 2 * np.pi * (2 * fs / k) * t)
    ref = (c1 + c2).astype(np.complex64)
    # echo: delay 8 wideband samples (= 2 channel samples), +6 Hz Doppler
    delay, dop = 8, 6.0
    echo = np.roll(ref, delay) * np.exp(1j * 2 * np.pi * dop * t)
    srv = (0.7 * ref + 0.1 * echo + 1e-3 * _cnoise(rng, n)).astype(np.complex64)

    nf, r_bins = 64, 8
    maps = np.asarray(process_wideband_frame(
        ref, srv, k, r_bins, nf, filter_len=6, sample_rate=fs,
        doppler_bins=(0,), window=("kaiser", 5.0)))
    assert maps.shape == (k, nf, r_bins + 1)
    for ch in (1, 2):
        m = np.abs(maps[ch])
        fbin, rbin = np.unravel_index(np.argmax(m), m.shape)
        assert rbin == r_bins - delay // k
        assert abs(fbin - (nf // 2 - dop)) <= 1

    integ = np.asarray(integrate_channels(maps))
    fbin, rbin = np.unravel_index(np.argmax(integ), integ.shape)
    assert rbin == r_bins - delay // k
