#!/bin/bash
# Round-5 evidence chain: slim cc_diagnose (hops=1 vs 2, fixed persist),
# then the staged 400k scaling re-run with the fixed code. Serialized so
# timings don't contaminate each other.
set -u
cd /root/repo
python scripts/cc_diagnose.py > BENCH/cc_diagnose_r05.log 2>&1
echo "CCDIAG EXIT $?" >> BENCH/cc_diagnose_r05.log
sleep 20
python -c "
import sys; sys.path.insert(0, '.')
import bench
bench.run_scaling_stages(n_docs=400000)
" > /tmp/stage_r05.out 2>/tmp/stage_r05.err
echo "STAGES EXIT $?" >> /tmp/stage_r05.err
