#!/bin/bash
# Round-4 session-3 agenda: after the eng-6 ladder tune, re-race with the
# new variants (eng6+ftw, md2/mt tiles), attribute eng-6's time, merge and
# bench.  One TPU client at a time; logs land in logs/.
cd /root/repo
set -x
timeout 2400 python scripts/tune.py md real 2>&1 | tee logs/r4c_tune_md2.log
timeout 5400 python scripts/tune.py 65536 131072 262144 524288 1048576 2>&1 | tee logs/r4c_tune_ladder_ftw.log
timeout 1800 python scripts/probe_eng6.py 131072 512 256 1024 2>&1 | tee logs/r4c_probe_eng6.log
timeout 600 python scripts/merge_tuning.py 2>&1 | tee logs/r4c_merge.log
timeout 3600 python bench.py 2>&1 | tee logs/r4c_bench.log
echo "AGENDA_C DONE"
