#!/bin/bash
# Round-4 fail-loud TPU campaign queue (VERDICT round-3 "Next round" #1).
#
# Lessons from round 3 (two stages died in <1 s on a sys.path error and
# nothing noticed): every scripts/*.py now self-repairs its environment
# via scripts/_bootstrap.py, and this launcher
#   - runs a preflight that reproduces the exact round-3 failure class
#     and aborts the whole queue loudly if it trips;
#   - checks every stage's exit code and appends a timestamped PASS/FAIL
#     line to results_quality/campaign_status.log (committed with the
#     results);
#   - gives each stage its own append-mode log (round-3 advisor finding:
#     '>' redirects clobbered predecessor logs).
#
# Stages are grouped into parts so the driver can interleave bench runs:
#   part1: preflight + the five missing learned-method columns
#   part2: L2A fill + symmetric standing pass (VERDICT #2)
#   part3: instance-wise redo at Gset scale (VERDICT #3)
#   part4: large-N rows + spectral-bound completion (VERDICT #4/#5)
# Usage: bash scripts/round4_campaign.sh <part>
set -u
cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
STATUS=results_quality/campaign_status.log

stage() {
  local name=$1 tmo=$2; shift 2
  local log="results_quality/r4_${name}.log"
  local attempt rc t0 t1 verdict
  for attempt in 1 2; do  # one fresh-process retry (TPU worker crashes
                          # kill a client's backend; CSVs are resumable)
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

part=${1:?usage: round4_campaign.sh <part>}
case "$part" in
1)
  stage preflight 300 python -u -c \
    "import rlsolver_tpu, jax; print('devices:', jax.devices())" \
    || { echo "PREFLIGHT FAILED - queue aborted" | tee -a "$STATUS"; exit 1; }
  stage new_isco_pignn 7200 python -u scripts/quality_table.py \
    --algs isco,pignn
  stage new_s2v_eco_jumanji 10800 python -u scripts/quality_table.py \
    --algs s2v,eco,jumanji
  ;;
2)
  # N>=500 isco/pignn: lost in part 1 to a TPU worker crash at BA_500
  # (resumable fill; pignn cells here use the fixed over-smoothing code)
  stage isco_pignn_500up 7200 python -u scripts/quality_table.py \
    --algs isco,pignn --sizes 500,600,700,800,900,1000
  # pignn redo at N<=400: those cells ran before the over-smoothing fix
  # (skip readout + loss normalization); rows are append-only
  stage pignn_redo 3600 python -u scripts/quality_table.py \
    --algs pignn --redo pignn --sizes 100,200,300,400
  # jumanji N>=400: part-1 OOM'd before the minibatched-PPO fix
  stage jumanji_400up 7200 python -u scripts/quality_table.py \
    --algs jumanji --sizes 400,500,600,700,800,900,1000
  stage l2a_fill 5400 python -u scripts/quality_table.py \
    --algs l2a --dists BA,PL --sizes 300,400,500,600,700,800,900,1000
  stage standing 7200 python -u scripts/standing_pass.py \
    --cells BA:500,BA:600,BA:700 --attempts 2
  ;;
2b)
  # isco N>=500: unblocked by chain segmentation (scan > 800 steps
  # crashed the axon worker; bisected + fixed in algos/isco.py)
  stage isco_500up 7200 python -u scripts/quality_table.py \
    --algs isco --sizes 500,600,700,800,900,1000
  # pignn N>=500 was never reached (the 500up stage died on the BA_500
  # isco worker crash before its pignn cells)
  stage pignn_500up 5400 python -u scripts/quality_table.py \
    --algs pignn --sizes 500,600,700,800,900,1000
  # jumanji redo under the fixed observation scale + 100/80 iters for
  # every cell that ran with part-1 code (N<=300 trained under the old
  # crushed observation scale; 600/700 additionally predate the fix and
  # were skipped by the fill-only 400up stage)
  stage jumanji_redo_small 7200 python -u scripts/quality_table.py \
    --algs jumanji --redo jumanji --sizes 100,200,300,600,700
  # ECO redo at a reference-class training budget (16384 loop steps x 64
  # envs, ~4x part-1 data) under the fixed per-episode observation scale
  ECO_STEPS=16384 \
    stage eco_redo 9000 python -u scripts/quality_table.py \
    --algs eco --redo eco
  ;;
2c)
  # symmetric convergence pass on every BA cell where L2A trails MCPG
  # (attempts=1 for wall-clock; both methods get the same extra attempt;
  # iters=40 — the packed eval engine, not policy quality, drives cuts)
  stage standing_lite 10800 python -u scripts/standing_pass.py \
    --cells BA:500,BA:600,BA:700,BA:800,BA:900,BA:1000 \
    --attempts 1 --iters 40
  ;;
3)
  stage iw_new 7200 python -u scripts/instance_wise.py \
    --insts G49like,G50like,G55like --algs bls,isco,mcpg,l2a --budget 300
  stage iw_redo 9000 python -u scripts/instance_wise.py \
    --insts G14like,G22like,G70like --algs bls,isco,mcpg,l2a \
    --redo bls,l2a --budget 300
  ;;
4)
  stage largen 9000 python -u scripts/quality_table.py \
    --algs greedy,sa,ga,rw,mcpg,l2a --dists BA,ER --sizes 2000,3000
  stage specb_fill 7200 python -u scripts/quality_table.py \
    --algs specb --dists PL --sizes 700,800,900,1000
  stage specb_fill2 7200 python -u scripts/quality_table.py \
    --algs specb --dists BA,ER --sizes 700,800,900,1000
  # large-N bounds: lighter certification (n^(1/1024) ~ 0.8% slack) keeps
  # the [N,N] float64 trace-power tractable at N=2000/3000
  SPECB_CERT=10 SPECB_ITERS=3000 \
    stage specb_largen 7200 python -u scripts/quality_table.py \
    --algs specb --dists BA,ER --sizes 2000,3000
  ;;
5)
  # bound-tightening redo at converged budgets (summarizer keeps the
  # per-instance MIN of certified bounds, so appends only tighten)
  SPECB_ITERS=20000 SPECB_BLOCK=32 \
    stage specb_tighten 9000 python -u scripts/quality_table.py \
    --algs specb --redo specb --dists BA --sizes 200,300,400,500,600,700
  SPECB_ITERS=16000 SPECB_BLOCK=32 \
    stage specb_tighten_erpl 9000 python -u scripts/quality_table.py \
    --algs specb --redo specb --dists ER,PL --sizes 500,600,700
  ;;
6c)
  # final stages after standing_3 was cut (its symmetric mcpg attempt ran
  # ~7x the estimate; the l2a attempt is recorded in boost_log.csv)
  stage iw_plateau 3600 python -u scripts/instance_wise.py \
    --insts G49like,G50like --algs bls,mcpg,isco --budget 150
  stage largen_2000 5400 python -u scripts/quality_table.py \
    --algs greedy,sa,ga,rw,mcpg --dists BA,ER --sizes 2000
  stage specb_pl 5400 python -u scripts/quality_table.py \
    --algs specb --dists PL --sizes 700,800,900,1000
  stage largen_3000 5400 python -u scripts/quality_table.py \
    --algs greedy,sa,ga,rw,mcpg --dists BA,ER --sizes 3000
  stage iw_55 3600 python -u scripts/instance_wise.py \
    --insts G55like --algs bls,mcpg,isco --budget 150
  SPECB_CERT=10 SPECB_ITERS=3000 \
    stage specb_largen 7200 python -u scripts/quality_table.py \
    --algs specb --dists BA,ER --sizes 2000,3000
  ;;
6b)
  # remainder of part 6 after the N>=900 isco batch rebalance (96 chains;
  # 256-chain cells ran 20-30 min each at dense-energy N^3 cost)
  stage isco_9001000 5400 python -u scripts/quality_table.py \
    --algs isco --sizes 900,1000
  stage standing_3 5400 python -u scripts/standing_pass.py \
    --cells BA:500,BA:600,BA:700 --attempts 1 --iters 40
  stage iw_plateau 3600 python -u scripts/instance_wise.py \
    --insts G49like,G50like --algs bls,mcpg,isco --budget 150
  stage largen_2000 5400 python -u scripts/quality_table.py \
    --algs greedy,sa,ga,rw,mcpg --dists BA,ER --sizes 2000
  stage specb_pl 5400 python -u scripts/quality_table.py \
    --algs specb --dists PL --sizes 700,800,900,1000
  stage largen_3000 5400 python -u scripts/quality_table.py \
    --algs greedy,sa,ga,rw,mcpg --dists BA,ER --sizes 3000
  stage iw_55 3600 python -u scripts/instance_wise.py \
    --insts G55like --algs bls,mcpg,isco --budget 150
  SPECB_CERT=10 SPECB_ITERS=3000 \
    stage specb_largen 7200 python -u scripts/quality_table.py \
    --algs specb --dists BA,ER --sizes 2000,3000
  ;;
6)
  # end-of-round value-dense cut of parts 2c/3/4, sized to the remaining
  # wall-clock: the isco cells lost to the N-scaled scan-work crash, then
  # standing on the three narrowest cells, the G49/G50 plateau rows
  # (toroidal grids are bipartite — the reference's 6000 / 5880
  # saturation analogue), BA/ER large-N rows, and the PL bound fill
  stage isco_700up 5400 python -u scripts/quality_table.py \
    --algs isco --sizes 700,800,900,1000
  stage standing_3 5400 python -u scripts/standing_pass.py \
    --cells BA:500,BA:600,BA:700 --attempts 1 --iters 40
  stage iw_plateau 3600 python -u scripts/instance_wise.py \
    --insts G49like,G50like --algs bls,mcpg,isco --budget 150
  stage largen_2000 5400 python -u scripts/quality_table.py \
    --algs greedy,sa,ga,rw,mcpg --dists BA,ER --sizes 2000
  stage specb_pl 5400 python -u scripts/quality_table.py \
    --algs specb --dists PL --sizes 700,800,900,1000
  stage largen_3000 5400 python -u scripts/quality_table.py \
    --algs greedy,sa,ga,rw,mcpg --dists BA,ER --sizes 3000
  stage iw_55 3600 python -u scripts/instance_wise.py \
    --insts G55like --algs bls,mcpg,isco --budget 150
  SPECB_CERT=10 SPECB_ITERS=3000 \
    stage specb_largen 7200 python -u scripts/quality_table.py \
    --algs specb --dists BA,ER --sizes 2000,3000
  ;;
*) echo "unknown part $part"; exit 2 ;;
esac
echo "[$(date -u +%FT%TZ)] PART $part DONE" >> "$STATUS"
