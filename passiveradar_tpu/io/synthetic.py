"""Synthetic two-channel FM capture generation.

Produces captures in the reference's HDF5 format (PRconfig.yaml:1-21): per
channel a stream of real interleaved IQ samples [I0, Q0, I1, Q1, ...] at the
input rate, with the radio channel situated ``offset_freq`` away from the
capture centre frequency (so the pipeline's down-conversion is exercised).

The scene model: the reference channel receives the direct transmitter
signal; the surveillance channel receives an attenuated direct-path copy
(clutter) plus point-target echoes with bistatic delay and Doppler shift,
plus receiver noise. This is the oracle scenario for end-to-end tests — each
injected target must reappear at its (delay, Doppler) cell in the output
range-Doppler maps.
"""

from __future__ import annotations

import dataclasses

import h5py
import numpy as np

from passiveradar_tpu.config import RadarConfig


@dataclasses.dataclass(frozen=True)
class Target:
    delay_samples: int      # bistatic delay at the *input* sample rate
    doppler_hz: float       # Doppler shift
    amplitude: float        # echo amplitude relative to the direct signal


def _fm_like_baseband(rng, n: int, bandwidth: float, fs: float) -> np.ndarray:
    """A noise-modulated FM-ish signal: constant envelope, ~bandwidth wide."""
    # integrate white noise → random phase walk, scaled to the FM deviation
    dev = 0.4 * bandwidth / 2
    msg = rng.standard_normal(n)
    # smooth the message a little (audio-ish spectrum)
    kernel = np.ones(8) / 8
    msg = np.convolve(msg, kernel, mode="same")
    phase = 2 * np.pi * dev * np.cumsum(msg) / fs
    return np.exp(1j * phase)


def synth_capture_arrays(cfg: RadarConfig, n_frames: int,
                         targets=(Target(30, 12.0, 0.05),),
                         direct_gain: float = 0.5,
                         noise_level: float = 1e-3,
                         channel_offset: int = 0,
                         seed: int = 0):
    """Generate (ref_stream, srv_stream) real interleaved IQ arrays.

    Streams are long enough for ``n_frames`` pipeline frames (plus the
    channel_offset alignment margin). ``channel_offset`` > 0 delays the
    surveillance channel by that many complex samples.
    """
    rng = np.random.default_rng(seed)
    fs = float(cfg.input_sample_rate)
    n_complex = (cfg.input_chunk_length // 2) * (n_frames + 1) + abs(channel_offset)

    base = _fm_like_baseband(rng, n_complex, cfg.channel_bandwidth, fs)
    t = np.arange(n_complex) / fs
    # place the channel at -offset_freq relative to capture centre so the
    # pipeline's +offset_freq shift brings it to baseband
    carrier = np.exp(-1j * 2 * np.pi * cfg.offset_freq * t)

    ref = base * carrier
    srv = direct_gain * base
    for tg in targets:
        echo = np.roll(base, tg.delay_samples) * np.exp(
            1j * 2 * np.pi * tg.doppler_hz * t)
        srv = srv + tg.amplitude * echo
    srv = srv * carrier
    srv = srv + noise_level * (rng.standard_normal(n_complex)
                               + 1j * rng.standard_normal(n_complex))
    ref = ref + noise_level * (rng.standard_normal(n_complex)
                               + 1j * rng.standard_normal(n_complex))

    if channel_offset > 0:
        srv = np.concatenate([np.zeros(channel_offset, complex),
                              srv[:-channel_offset]])
    elif channel_offset < 0:
        srv = np.concatenate([srv[-channel_offset:],
                              np.zeros(-channel_offset, complex)])

    def interleave(x):
        out = np.empty(2 * len(x), np.float32)
        out[0::2] = np.real(x)
        out[1::2] = np.imag(x)
        return out

    return interleave(ref), interleave(srv)


def synth_capture_device(cfg: RadarConfig, n_frames: int,
                         targets=(Target(30, 12.0, 0.05),),
                         direct_gain: float = 0.5,
                         noise_level: float = 1e-3,
                         seed: int = 0,
                         complex_output: bool = False):
    """Device-side scene generator: same scene model as synth_capture_arrays
    but computed with jnp on the accelerator and returned as per-frame raw
    chunk arrays (n_frames, input_chunk_length) float32 per channel.

    Exists because benchmark hosts may have very weak CPUs — generating a
    multi-GB capture with numpy would dominate the wall clock.
    """
    import jax
    import jax.numpy as jnp

    from passiveradar_tpu.ops.mixer import frequency_shift

    half = cfg.input_chunk_length // 2
    n_complex = half * n_frames
    fs = float(cfg.input_sample_rate)
    dev = 0.4 * cfg.channel_bandwidth / 2

    @jax.jit
    def gen(key):
        k1, k2a, k2b, k3a, k3b = jax.random.split(key, 5)
        msg = jax.random.normal(k1, (n_complex + 8,), jnp.float32)
        c = jnp.cumsum(msg)
        msg = (c[8:] - c[:-8]) / 8.0                       # 8-tap smoother
        phase = 2 * np.pi * dev * jnp.cumsum(msg) / fs
        base = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))

        srv = direct_gain * base
        for tg in targets:
            echo = jnp.roll(base, tg.delay_samples)
            echo = frequency_shift(echo, tg.doppler_hz, fs)
            srv = srv + tg.amplitude * echo

        # place the channel at -offset_freq from capture centre
        ref = frequency_shift(base, -float(cfg.offset_freq), fs)
        srv = frequency_shift(srv, -float(cfg.offset_freq), fs)
        ref = ref + noise_level * jax.lax.complex(
            jax.random.normal(k2a, (n_complex,), jnp.float32),
            jax.random.normal(k2b, (n_complex,), jnp.float32))
        srv = srv + noise_level * jax.lax.complex(
            jax.random.normal(k3a, (n_complex,), jnp.float32),
            jax.random.normal(k3b, (n_complex,), jnp.float32))

        if complex_output:
            return (ref.reshape(n_frames, half).astype(jnp.complex64),
                    srv.reshape(n_frames, half).astype(jnp.complex64))

        def interleave(x):
            out = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)
            return out.reshape(n_frames, cfg.input_chunk_length)

        return interleave(ref), interleave(srv)

    return gen(jax.random.key(seed))


def write_synth_capture(path: str, cfg: RadarConfig, n_frames: int,
                        interleaved: bool | None = None,
                        dtype=np.float32, **kwargs) -> None:
    """Write a synthetic capture to HDF5 in the reference's file layout.

    interleaved=True writes the single-dataset 4-way interleaved layout
    ([refI, refQ, srvI, srvQ, ...], reference main.py:46-75); default follows
    cfg.interleaved_input_channels. dtype int16 emulates integer SDR captures.
    """
    ref, srv = synth_capture_arrays(cfg, n_frames, **kwargs)
    if interleaved is None:
        interleaved = cfg.interleaved_input_channels
    if dtype == np.int16:
        scale = 32000.0 / max(np.max(np.abs(ref)), np.max(np.abs(srv)))
        ref = (ref * scale).astype(np.int16)
        srv = (srv * scale).astype(np.int16)
    with h5py.File(path, "w") as f:
        if interleaved:
            n_pairs = min(len(ref), len(srv)) // 2
            data = np.empty(4 * n_pairs, dtype=dtype)
            data[0::4] = ref[0:2 * n_pairs:2]
            data[1::4] = ref[1:2 * n_pairs:2]
            data[2::4] = srv[0:2 * n_pairs:2]
            data[3::4] = srv[1:2 * n_pairs:2]
            f.create_dataset(cfg.interleaved_data_path, data=data)
        else:
            f.create_dataset(cfg.input_ref_path, data=ref)
            f.create_dataset(cfg.input_srv_path, data=srv)
