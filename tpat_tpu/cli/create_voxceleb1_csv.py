"""Generate the VoxCeleb1 label CSV the analysis tools consume.

Reference: ``/root/reference/audiomae/util/create_voxceleb1_csv.py`` —
writes ``voxceleb1_label.csv`` rows ``{i},/m/vc{i+1:04d},"sid-{i+1:04d}"``.
The reference iterates ``range(1252)`` ("0 to 1251 inclusive"), emitting
1252 rows even though VoxCeleb1 has 1251 speakers; replicated verbatim
so downstream index->name lookups match (the extra final row is simply
never referenced).

Usage: python -m tpat_tpu.cli.create_voxceleb1_csv [--out voxceleb1_label.csv]
"""

from __future__ import annotations

import argparse


def create_csv(out: str = "voxceleb1_label.csv", n: int = 1252) -> str:
    with open(out, "w", encoding="utf-8") as f:
        f.write("index,mid,display_name\n")
        for i in range(n):
            f.write(f'{i},/m/vc{i + 1:04d},"sid-{i + 1:04d}"\n')
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="voxceleb1_label.csv")
    args = p.parse_args(argv)
    path = create_csv(args.out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
