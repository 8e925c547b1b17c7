"""Command-line entry points mirroring the reference's script surface.

    python -m passiveradar_tpu.cli.process    --config cfg.yaml
    python -m passiveradar_tpu.cli.preview    --config cfg.yaml
    python -m passiveradar_tpu.cli.plot       --config cfg.yaml --mode {video,frames}
    python -m passiveradar_tpu.cli.track_simple --config cfg.yaml --mode {video,frames,plot}
    python -m passiveradar_tpu.cli.track_multi  --config cfg.yaml --mode {video,frames,plot}

(reference: main.py, signal_preview.py, range_doppler_plot.py,
simple_kalman_tracker.py, multitarget_kalman_tracker.py)
"""
