#!/bin/bash
# Round-3 TPU queue, part 3: backfill holes first (BA_800-1000 l2a, then
# any PL cells the running PL-redo stage doesn't reach), then the new
# learned-method columns, large-N rows, and the instance-wise campaign.
# No --redo anywhere: every stage only fills missing cells, so a cutoff
# can't lose data.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
set -x
timeout 2700 python -u scripts/quality_table.py \
  --algs l2a --dists BA --sizes 800,900,1000 \
  >> results_quality/runner_l2a_r3.log 2>&1
timeout 2700 python -u scripts/quality_table.py \
  --algs l2a --dists PL --sizes 300,400,500,600,700,800,900,1000 \
  >> results_quality/runner_l2a_r3.log 2>&1
timeout 3600 python -u scripts/quality_table.py \
  --algs pignn,isco \
  > results_quality/runner_new1.log 2>&1
timeout 4500 python -u scripts/quality_table.py \
  --algs s2v,eco,jumanji \
  > results_quality/runner_new2.log 2>&1
# VERDICT #5a: reference BA/ER tables run to N=2000-3000
timeout 4500 python -u scripts/quality_table.py \
  --algs greedy,sa,ga,rw,mcpg,l2a --dists BA,ER --sizes 2000,3000 \
  > results_quality/runner_largen.log 2>&1
# VERDICT #4/#5b: instance-wise with the tabu-BLS engine, fused-ls L2A,
# isco column, and the G49/G50/G55like stand-ins (reference 600 s budget)
timeout 14400 python -u scripts/instance_wise.py \
  --insts G14like,G22like,G70like,G49like,G50like,G55like \
  --algs bls,isco,mcpg,l2a --redo bls,l2a --budget 600 \
  > results_quality/runner_iw_r3.log 2>&1
echo ALL_STAGES_DONE
