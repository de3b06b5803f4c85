#!/bin/bash
# tmpfs scratch for best-checkpoint churn — mirrors /root/reference/ramdisk.sh.
# On most Linux images /dev/shm already is tmpfs; this creates a dedicated
# mount when run with privileges.
set -euo pipefail
dir=${1:-/tmp/ramdisk}
mkdir -p "$dir"
if ! mountpoint -q "$dir"; then
  sudo mount -t tmpfs -o size=8g tmpfs "$dir" || \
    echo "mount failed (no sudo?) — falling back to plain dir $dir"
fi
echo "scratch ready: $dir"
