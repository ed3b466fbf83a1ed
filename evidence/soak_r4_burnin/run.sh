#!/bin/bash
cd /tmp/r4_burnin
export PYTHONPATH=/root/repo:/root/.axon_site
export EADGAN_SYNTH_N=8192
export EADGAN_FAULT_HANG_STEP=30000
export EADGAN_FAULT_HANG_MARKER=/tmp/r4_burnin/hang_fired
export EADGAN_FAULT_KILL_SAVE_STEP=45000
export EADGAN_FAULT_KILL_SAVE_MARKER=/tmp/r4_burnin/kill_save_fired
python -m eadgan_tpu.cli.supervise --max_restarts 4 celeba \
  --n_epochs 1563 --sample_interval 1000 --watchdog 120 \
  --jsonl /tmp/r4_burnin/metrics.jsonl > /tmp/r4_burnin/supervise.log 2>&1
echo "rc=$?" > /tmp/r4_burnin/DONE
