"""Generate the VoxCeleb1 label CSV — equivalent of
``/root/reference/audiomae/util/create_voxceleb1_csv.py`` (a dummy
(index, mid, display_name) table for the 1251 speakers, used only so the
shared label-CSV machinery works for speaker ID)."""

import argparse
import csv


def write_voxceleb1_csv(path: str, num_speakers: int = 1251):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "mid", "display_name"])
        for i in range(num_speakers + 1):
            w.writerow([i, f"/m/spk{i:05d}", f"speaker {i}"])
    return path


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("output", help="csv path to write")
    p.add_argument("--num_speakers", type=int, default=1251)
    a = p.parse_args()
    write_voxceleb1_csv(a.output, a.num_speakers)
