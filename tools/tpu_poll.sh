#!/bin/bash
# Poll the axon TPU tunnel; the moment it answers, run the queued
# round-4 gate + bench sweep (tools/tpu_round.sh). Round-3 postmortem:
# the tunnel died mid-round and the whole kernel redesign went
# unvalidated — this poller turns "wait for the chip" into a background
# job instead of a foreground stall.
#
# Usage: bash tools/tpu_poll.sh [interval_s]   (default 300)
# Writes status lines to /tmp/tpu_poll.log; touches
# /tmp/tpu_up.stamp when the chip answers.
cd /root/repo
INTERVAL=${1:-300}
while true; do
  ts=$(date '+%F %T')
  if timeout 150 python -c "import jax; assert jax.default_backend() == 'tpu'; print(len(jax.devices()))" > /tmp/tpu_probe.out 2>&1; then
    echo "$ts TPU UP ($(cat /tmp/tpu_probe.out)) — launching tpu_round.sh" >> /tmp/tpu_poll.log
    touch /tmp/tpu_up.stamp
    bash tools/tpu_round.sh >> /tmp/tpu_poll.log 2>&1
    echo "$ts tpu_round.sh finished" >> /tmp/tpu_poll.log
    exit 0
  fi
  echo "$ts tpu down" >> /tmp/tpu_poll.log
  sleep "$INTERVAL"
done
