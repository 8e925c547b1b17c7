"""Wideband multi-illuminator processing entry point (BASELINE config 4).

Channelizes a wideband capture (DVB-T-class band, or a band of FM stations)
into K critically-sampled channels and runs the per-channel clutter + CAF
chain, writing one range-Doppler stack per selected channel
(``<output>.chK.<ftype>``) plus shared metadata. Enable by setting
``wideband_channels: K`` (and optionally ``wideband_channel_select``) in the
YAML. The reference has no wideband path; this is the framework's
per-illuminator surface (SURVEY §2.3).
"""

from __future__ import annotations

import time

from passiveradar_tpu.cli.common import fail_on_missing_capture, banner, load, parser
from passiveradar_tpu.io.hdf5 import CaptureReader
from passiveradar_tpu.io.writers import write_metadata
from passiveradar_tpu.wideband import channel_path, run_wideband_capture


@fail_on_missing_capture
def main(argv=None):
    p = parser("PASSIVE RADAR - WIDEBAND MULTI-ILLUMINATOR PROCESSING")
    p.add_argument("--batch-frames", type=int, default=None,
                   help="CPIs per device dispatch (default: cfg.frame_batch)")
    p.add_argument("--shard", action="store_true",
                   help="Shard the selected-channel axis across all local "
                        "devices (channel count must divide the device count)")
    p.add_argument("--integrate", action="store_true",
                   help="Also write the noncoherently integrated "
                        "multi-illuminator stack (sum of |CAF| over the "
                        "selected channels) to <output>.integrated.<ftype>")
    args = p.parse_args(argv)
    cfg = load(args)
    if cfg.wideband_channels < 2:
        raise SystemExit("error: set wideband_channels: K (K >= 2) in the "
                         "configuration to enable wideband mode")
    banner(cfg)
    print(f"Wideband: {cfg.wideband_channels} channels of "
          f"{cfg.IF_sample_rate / 1e3:.1f} kHz; processing channels "
          f"{list(cfg.wideband_channel_select)}")

    mesh = None
    if args.shard:
        from passiveradar_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(axis_name="channels")

    reader = CaptureReader(cfg)
    t0 = time.time()
    n = run_wideband_capture(reader, cfg, batch_frames=args.batch_frames,
                             mesh=mesh, integrate=args.integrate)
    write_metadata(cfg, n)
    dt = time.time() - t0
    paths = ", ".join(channel_path(cfg, k)
                      for k in cfg.wideband_channel_select)
    if args.integrate:
        from passiveradar_tpu.wideband import integrated_path
        paths += f", {integrated_path(cfg)} (integrated)"
    print(f"Saved {n} CPIs x {len(cfg.wideband_channel_select)} channels "
          f"({n / dt:.1f} CPI/s) to {paths}; metadata in {cfg.meta_fname}")
    reader.close()


if __name__ == "__main__":
    main()
