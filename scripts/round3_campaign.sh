#!/bin/bash
# Round-3 TPU campaign queue. One TPU process at a time (shared-HBM
# discipline, CLAUDE.md). Stages ordered by VERDICT round-2 leverage:
# 1a/1b. l2a redo with the packed-sweep engine (flagship standing, item #1)
#        BA first: the "L2A >= MCPG on BA" bar is the headline check.
# 2. isco+pignn columns (item #2)
# 3. s2v/eco/jumanji columns (item #2)
# 4. instance-wise: isco column + bls/l2a engine-upgrade redo (items #4/#5)
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
set -x
timeout 1500 python -u scripts/quality_table.py \
  --algs l2a --redo l2a --dists BA \
  > results_quality/runner_l2a_r3.log 2>&1
timeout 1500 python -u scripts/quality_table.py \
  --algs l2a --redo l2a --dists ER,PL \
  >> results_quality/runner_l2a_r3.log 2>&1
timeout 1200 python -u scripts/quality_table.py \
  --algs pignn,isco \
  > results_quality/runner_new1.log 2>&1
timeout 1200 python -u scripts/quality_table.py \
  --algs s2v,eco,jumanji \
  > results_quality/runner_new2.log 2>&1
timeout 1800 python -u scripts/instance_wise.py \
  --insts G14like,G22like,G49like,G50like,G55like,G70like \
  --algs bls,isco,mcpg,l2a --redo bls,l2a --budget 240 \
  > results_quality/runner_iw_r3.log 2>&1
echo ALL_STAGES_DONE
