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


def _pairs(x) -> np.ndarray:
    """complex64 host array → float32 (n, 2) pair view (complex transfers
    are unsupported on some remote backends)."""
    x = np.ascontiguousarray(np.asarray(x).astype(np.complex64, copy=False))
    return x.view(np.float32).reshape(-1, 2)


@functools.partial(jax.jit, static_argnames=("nperseg",))
def _welch_core(p, nperseg: int):
    x = jax.lax.complex(p[:, 0], p[:, 1])
    n = (x.shape[0] // nperseg) * nperseg
    segs = x[:n].reshape(-1, nperseg)
    win = jnp.hanning(nperseg).astype(jnp.float32)
    spec = jnp.fft.fftshift(jnp.fft.fft(segs * win, axis=1), axes=1)
    return 10 * jnp.log10(jnp.mean(jnp.abs(spec) ** 2, axis=0) + 1e-12)


def welch_psd(x, nperseg: int = 4096):
    """Simple mean-of-periodograms PSD (device-side, complex-transfer-free)."""
    return np.asarray(_welch_core(_pairs(x), nperseg))


@fail_on_missing_capture
def main(argv=None):
    p = parser("PASSIVE RADAR - SIGNAL PREVIEW")
    args = p.parse_args(argv)
    cfg = load(args)

    reader = CaptureReader(cfg, estimate_offset=True,
                           max_offset_lags=50_000)
    print(f"Estimated channel offset: {reader.offset} samples")
    ref_h, srv_h = reader.read_iq_frames(0, 1)
    ref_h, srv_h = ref_h[0], srv_h[0]

    raw_psd_ref = welch_psd(ref_h)
    raw_psd_srv = welch_psd(srv_h)

    # channelize: tune + resample + lag scan, all inside one jitted program
    # fed float pairs (reference signal_preview.py:59-65)
    nlag = 2000

    @jax.jit
    def _channel_diag(pr, ps):
        r = jax.lax.complex(pr[:, 0], pr[:, 1])
        s = jax.lax.complex(ps[:, 0], ps[:, 1])
        r_ch = resample_poly(
            frequency_shift(r, cfg.offset_freq, cfg.input_sample_rate),
            cfg.resamp_up, cfg.resamp_dn, padtype="line")
        s_ch = resample_poly(
            frequency_shift(s, cfg.offset_freq, cfg.input_sample_rate),
            cfg.resamp_up, cfg.resamp_dn, padtype="line")
        xc = jnp.abs(xcorr(r_ch, s_ch, nlag, nlag))
        return (jnp.stack([jnp.real(r_ch), jnp.imag(r_ch)], -1),
                jnp.stack([jnp.real(s_ch), jnp.imag(s_ch)], -1), xc)

    rch_p, sch_p, xc = _channel_diag(_pairs(ref_h), _pairs(srv_h))
    ch_psd_ref = welch_psd(np.asarray(rch_p).view(np.complex64)[:, 0], 1024)
    ch_psd_srv = welch_psd(np.asarray(sch_p).view(np.complex64)[:, 0], 1024)
    xc = np.asarray(xc)

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
