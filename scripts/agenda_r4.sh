#!/bin/bash
# Round-4 session agenda: the outage-queued on-chip runs, serialized
# (one TPU client at a time). Logs land in logs/.
cd /root/repo
set -x
timeout 1800 python scripts/drive_r3s3.py --with-probe 2>&1 | tee logs/r4_drive.log
timeout 1800 python scripts/probe_mxu_shapes.py 2>&1 | tee logs/r4_mxu_shapes.log
timeout 1800 python scripts/probe_xla_fft.py 2>&1 | tee logs/r4_xla_fft.log
timeout 3600 python scripts/tune.py 65536 4096 md real 2>&1 | tee logs/r4_tune1.log
echo "AGENDA DONE"
