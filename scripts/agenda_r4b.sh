#!/bin/bash
cd /root/repo
set -x
timeout 5400 python scripts/tune.py 131072 262144 524288 1048576 2>&1 | tee logs/r4_tune_ladder.log
timeout 2400 python scripts/tune.py 65536 md real 2>&1 | tee logs/r4_tune_md.log
echo "AGENDA_B DONE"
