"""Reassemble multi-host `.partN` output shards into one frame stack.

Counterpart of the multi-host runtime (parallel/distributed.py): each host
writes a contiguous frame range to `<output>.partN.<ftype>`; this tool
streams them into the single `<output>.<ftype>` stack the plotting/tracking
tools expect (the reference's single-file contract, main.py:200-227).
"""

from __future__ import annotations

import glob
import os
import re

from passiveradar_tpu.cli.common import banner, load, parser
from passiveradar_tpu.io.writers import concat_parts, write_metadata


def find_parts(cfg) -> list[str]:
    pat = f"{cfg.output_fname}.part*.{cfg.range_doppler_map_ftype}"
    def idx(p):
        m = re.search(r"\.part(\d+)\.", os.path.basename(p))
        return int(m.group(1)) if m else -1
    parts = sorted(glob.glob(pat), key=idx)
    ids = [idx(p) for p in parts]
    if ids != list(range(len(parts))):
        raise SystemExit(f"error: shard files are not a contiguous "
                         f"part0..partN sequence: {parts}")
    return parts


def main(argv=None):
    p = parser("PASSIVE RADAR - MERGE MULTI-HOST OUTPUT SHARDS")
    p.add_argument("--keep-parts", action="store_true",
                   help="Keep the .partN shard files after merging")
    args = p.parse_args(argv)
    cfg = load(args)
    banner(cfg)
    parts = find_parts(cfg)
    if not parts:
        raise SystemExit(f"error: no {cfg.output_fname}.part*."
                         f"{cfg.range_doppler_map_ftype} shard files found")
    out = cfg.range_doppler_map_fname
    total = concat_parts(parts, out, cfg.range_doppler_map_ftype)
    write_metadata(cfg, total)
    print(f"Merged {len(parts)} shards ({total} frames) into {out}; "
          f"metadata in {cfg.meta_fname}")
    if not args.keep_parts:
        for part in parts:
            os.remove(part)


if __name__ == "__main__":
    main()
