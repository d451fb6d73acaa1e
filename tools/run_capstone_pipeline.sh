#!/bin/bash
# Round-5 capstone pipeline (see BASELINE.md round-5 z A/B section):
#   1. wait for the base 80K run's supervisor (PID $1) to exit;
#   2. fork the z A/B arms from the 80K checkpoint (ctrl/norm, 80K->92K at
#      a true 1e-4 via the staircase configs) and train them sequentially
#      on the single chip;
#   3. run the full eval battery (tools/eval_checkpoint.sh) on base 80K and
#      both 92K arms. Evals overlap arm training deliberately: the eval is
#      host-CPU(ICP)-bound while training is device-bound, and the axon
#      tunnel accepts concurrent clients (probed). Evals run under nice so
#      the training loop keeps the single host core and the supervisor's
#      CSV stall detector does not trip.
#
# Usage: tools/run_capstone_pipeline.sh SUPERVISOR_PID
set -u
SUP_PID=${1:?base-run supervisor pid}
cd "$(dirname "$0")/.."
BASE=output/lov_syn_capstone/lov_train_syn_train/vgg16_convs
CKPT80=$BASE/vgg16_fcn_color_lov_syn_capstone_iter_80000.npz

echo "[pipeline] waiting for base supervisor (pid $SUP_PID)"
while kill -0 "$SUP_PID" 2>/dev/null; do sleep 60; done
if [ ! -f "$CKPT80" ]; then
    echo "[pipeline] FATAL: supervisor exited but $CKPT80 is missing"
    exit 1
fi
echo "[pipeline] base 80K complete; launching base eval (bg) + arms"

nice -n 15 bash tools/eval_checkpoint.sh "$CKPT80" \
    output/lov_syn_capstone_eval_80k \
    > output/lov_syn_capstone_eval_80k.log 2>&1 &

for arm in ctrl norm; do
    RUN=output/lov_syn_capstone_${arm}/lov_train_syn_train/vgg16_convs
    mkdir -p "$RUN"
    cp "$CKPT80" "$RUN/vgg16_fcn_color_lov_syn_capstone_${arm}_iter_80000.npz"
    echo "[pipeline] arm $arm: forked from 80K, training to 92K"
    python tools/supervise_train.py \
        --cfg "experiments/cfgs/lov_syn_capstone_${arm}.yml" \
        --imdb lov_syn_train --iters 92000 \
        --log "output/lov_syn_capstone_${arm}_child.log" \
        > "output/lov_syn_capstone_${arm}_supervisor.log" 2>&1
    CK=$RUN/vgg16_fcn_color_lov_syn_capstone_${arm}_iter_92000.npz
    if [ -f "$CK" ]; then
        echo "[pipeline] arm $arm complete; eval (bg)"
        nice -n 15 bash tools/eval_checkpoint.sh "$CK" \
            "output/lov_syn_capstone_eval_${arm}_92k" \
            > "output/lov_syn_capstone_eval_${arm}_92k.log" 2>&1 &
    else
        echo "[pipeline] WARN: arm $arm finished without a 92K checkpoint"
    fi
done

wait
echo "[pipeline] done"
