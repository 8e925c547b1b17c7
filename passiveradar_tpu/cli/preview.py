"""Capture diagnostics: PSDs + channel cross-correlation
(reference signal_preview.py:24-82).

The spectra are computed on device (Welch periodogram in jnp) — benchmark
hosts may have very weak CPUs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from passiveradar_tpu.cli.common import fail_on_missing_capture, load, parser
from passiveradar_tpu.io.hdf5 import CaptureReader
from passiveradar_tpu.ops.fir import resample_poly
from passiveradar_tpu.ops.mixer import frequency_shift
from passiveradar_tpu.ops.xcorr import xcorr


import functools
import jax


@functools.partial(jax.jit, static_argnames=("nperseg",))
def _welch_core(x, nperseg: int):
    n = (x.shape[0] // nperseg) * nperseg
    segs = x[:n].reshape(-1, nperseg)
    win = jnp.hanning(nperseg).astype(jnp.float32)
    spec = jnp.fft.fftshift(jnp.fft.fft(segs * win, axis=1), axes=1)
    return 10 * jnp.log10(jnp.mean(jnp.abs(spec) ** 2, axis=0) + 1e-12)


def welch_psd(x: jnp.ndarray, nperseg: int = 4096):
    """Simple mean-of-periodograms PSD (jitted — eager complex ops are
    unsupported on some remote backends)."""
    return np.asarray(_welch_core(x, nperseg))


@fail_on_missing_capture
def main(argv=None):
    p = parser("PASSIVE RADAR - SIGNAL PREVIEW")
    args = p.parse_args(argv)
    cfg = load(args)

    reader = CaptureReader(cfg, estimate_offset=True,
                           max_offset_lags=50_000)
    print(f"Estimated channel offset: {reader.offset} samples")
    ref, srv = reader.read_iq_frames(0, 1)
    ref, srv = jnp.asarray(ref[0]), jnp.asarray(srv[0])

    raw_psd_ref = welch_psd(ref)
    raw_psd_srv = welch_psd(srv)

    # channelize: tune + resample (reference signal_preview.py:59-65)
    ref_ch = resample_poly(
        frequency_shift(ref, cfg.offset_freq, cfg.input_sample_rate),
        cfg.resamp_up, cfg.resamp_dn, padtype="line")
    srv_ch = resample_poly(
        frequency_shift(srv, cfg.offset_freq, cfg.input_sample_rate),
        cfg.resamp_up, cfg.resamp_dn, padtype="line")
    ch_psd_ref = welch_psd(ref_ch, 1024)
    ch_psd_srv = welch_psd(srv_ch, 1024)

    nlag = 2000
    xc = np.asarray(jax.jit(jnp.abs)(xcorr(ref_ch, srv_ch, nlag, nlag)))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, figsize=(9, 10), dpi=110)
    f_in = np.linspace(-0.5, 0.5, len(raw_psd_ref)) * cfg.input_sample_rate
    axes[0].plot(f_in / 1e3, raw_psd_ref, label="ref")
    axes[0].plot(f_in / 1e3, raw_psd_srv, label="srv", alpha=0.7)
    axes[0].set_title("Raw capture PSD")
    axes[0].set_xlabel("kHz from centre")
    axes[0].legend()

    f_if = np.linspace(-0.5, 0.5, len(ch_psd_ref)) * cfg.IF_sample_rate
    axes[1].plot(f_if / 1e3, ch_psd_ref, label="ref")
    axes[1].plot(f_if / 1e3, ch_psd_srv, label="srv", alpha=0.7)
    axes[1].set_title("Channelized PSD")
    axes[1].set_xlabel("kHz")
    axes[1].legend()

    axes[2].plot(np.arange(-nlag, nlag + 1), xc)
    axes[2].set_title("Channel cross-correlation")
    axes[2].set_xlabel("lag (samples)")

    fig.tight_layout()
    fig.savefig("SIGNAL_PREVIEW.png")
    print("Wrote SIGNAL_PREVIEW.png")
    reader.close()


if __name__ == "__main__":
    main()
