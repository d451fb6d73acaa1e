#!/bin/bash
# Full evaluation battery for one checkpoint on the frozen val set:
#   eval_summary (+ICP +matching refinement) + vis overlays,
#   rotation diagnostics on val AND train frames (generalization gap),
#   z-channel analysis, and (optional) the point-to-plane ICP A/B.
#
# Usage: tools/eval_checkpoint.sh CKPT OUT_DIR [--ab]
set -e
CKPT="$1"; OUT="$2"; AB="$3"
CFG=experiments/cfgs/lov_syn_refresh.yml
cd "$(dirname "$0")/.."

python tools/test_net.py --cfg "$CFG" --imdb lov_syn_val \
    --model "$CKPT" --output "$OUT" --vis
python tools/diag_rot.py --model "$CKPT" --imdb lov_syn_val \
    --frames 16 --out "$OUT/diag_rot_val.json"
python tools/diag_rot.py --model "$CKPT" --imdb lov_syn_train \
    --frames 16 --out "$OUT/diag_rot_train.json"
python tools/analyze_z.py --dets "$OUT/detections.npz" \
    --out "$OUT/z_analysis.json"

if [ "$AB" = "--ab" ]; then
    # ICP energy A/B (round-3 verdict task 7): point-to-point (default)
    # vs +point-to-plane; same detections, refinement only
    python tools/test_net.py --cfg "$CFG" --imdb lov_syn_val \
        --model "$CKPT" --output "${OUT}_p2plane" --icp_plane_weight 1.0
fi

python - "$OUT" <<'EOF'
import json, sys
d = json.load(open(f"{sys.argv[1]}/eval_summary.json"))
print({k: round(v, 4) for k, v in d.items() if isinstance(v, (int, float))})
for tag in ("val", "train"):
    r = json.load(open(f"{sys.argv[1]}/diag_rot_{tag}.json"))
    print(tag, {k: round(v, 3) for k, v in r["pred_hough"].items()})
EOF
