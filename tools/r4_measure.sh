#!/bin/bash
# Round-4 serialized TPU measurement sequence. ONE TPU client at a time,
# everything under timeout (see CLAUDE.md relay gotchas). Logs to /tmp.
set -x
cd /root/repo

# 0. Kernel lowering + correctness gate on hardware (new r4 kernels).
timeout 2400 python -u tools/tpu_smoke.py --exec > /tmp/r4_smoke.log 2>&1
echo "smoke: $?" >> /tmp/r4_smoke.log

# 1. Uniform-step decomposition.
timeout 2400 python -u benchmarks/step_breakdown.py > /tmp/r4_stepbd.log 2>&1
echo "stepbd: $?" >> /tmp/r4_stepbd.log

# 2. Attention kernel decomposition (r4 fused vs r3 pieces).
timeout 2400 python -u benchmarks/attend_bwd_probe.py > /tmp/r4_attend.log 2>&1
echo "attend: $?" >> /tmp/r4_attend.log

# 3. Full perf suite (incl. skewed GATv2 row).
timeout 3600 python -u benchmarks/perf_suite.py > /tmp/r4_suite.log 2>&1
echo "suite: $?" >> /tmp/r4_suite.log

# 4. Headline bench, 3 fresh subprocesses per row.
timeout 5400 python -u bench.py > /tmp/r4_bench.log 2>&1
echo "bench: $?" >> /tmp/r4_bench.log
