"""Shared CLI plumbing."""

from __future__ import annotations

import argparse

from passiveradar_tpu.config import RadarConfig, load_config


def parser(description: str, modes=None) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", required=True, type=str,
                   help="Path to the YAML configuration file")
    if modes:
        p.add_argument("--mode", type=str, choices=list(modes),
                       default=list(modes)[0],
                       help=f"Output mode ({'/'.join(modes)})")
    return p


def load(args) -> RadarConfig:
    return load_config(args.config)


def banner(cfg: RadarConfig) -> None:
    print("-" * 67)
    print("   PASSIVE RADAR (TPU) ")
    print("-" * 67)
    print(f"Input file: {cfg.input_file}")
    print(f"Channel {cfg.channel_freq / 1e6:.1f} MHz, "
          f"bandwidth {cfg.channel_bandwidth / 1e3:.1f} kHz")
    print(f"Input rate {cfg.input_sample_rate / 1e6:.1f} MHz, "
          f"IF rate {cfg.IF_sample_rate / 1e3:.1f} kHz")
    print(f"Max bistatic range {cfg.max_range_actual:.2f} km "
          f"(cell {cfg.range_cell_width:.2f} km)")
    print(f"Max Doppler {cfg.max_doppler_actual:.2f} Hz "
          f"(cell {cfg.doppler_cell_width:.4f} Hz)")
