#!/usr/bin/env python
"""Freeze a synthetic dataset split to disk with a hash manifest.

Renders every frame of a (deterministic) synthetic imdb to npz files plus a
`manifest.json` of per-frame content hashes. The manifest is committed to
git; the npz files are regenerable from it (`--verify` re-renders and checks).
`FrozenSyntheticDataset` then serves the split from disk and refuses frames
whose hash drifted — accuracy numbers stay comparable across renderer
changes (round-2 verdict, "weak" #7).

Usage:
  python tools/freeze_dataset.py --imdb lov_syn_val --out data/lov_syn_val_v3
  python tools/freeze_dataset.py --imdb lov_syn_val --num 256 --out data/lov_syn_val_v4
  python tools/freeze_dataset.py --verify data/lov_syn_val_v3
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imdb", default="lov_syn_val")
    ap.add_argument("--out", default=None)
    ap.add_argument("--num", type=int, default=None,
                    help="frame count for the re-frozen split (default: keep "
                         "the registered dataset's size)")
    ap.add_argument("--verify", default=None, help="snapshot dir to verify against a fresh render")
    args = ap.parse_args()

    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.data.synthetic import SyntheticDataset, _frame_digest, freeze_dataset
    from posecnn_tpu.data.lov import lov

    if args.verify:
        with open(os.path.join(args.verify, "manifest.json")) as fh:
            manifest = json.load(fh)
        split = manifest["name"].rsplit("_", 1)[-1]
        live = SyntheticDataset(lov("train"), split=split, num_images=manifest["num_images"])
        bad = 0
        for i in range(manifest["num_images"]):
            got = _frame_digest(live.load_frame(i))
            if got != manifest["frames"][i]:
                print(f"frame {i}: MISMATCH {got[:12]} != {manifest['frames'][i][:12]}")
                bad += 1
        print(f"verified {manifest['num_images']} frames, {bad} mismatches")
        sys.exit(1 if bad else 0)

    imdb = get_imdb(args.imdb)
    if not isinstance(imdb, SyntheticDataset) or args.num:
        # frozen already registered (or a different size was asked for):
        # rebuild the live dataset to re-freeze; val seeds are i+10_000_000
        # (SyntheticDataset._seed0) so a larger val set extends the same
        # held-out seed region — still disjoint from the train stream
        # (seed0 0) and the refresh stream (seed0 50_000_000)
        imdb = SyntheticDataset(lov("train"), split="val",
                                num_images=args.num or 64)
    out = args.out or f"data/{args.imdb}_v3"
    manifest = freeze_dataset(imdb, out)
    print(f"froze {manifest['num_images']} frames of {manifest['name']} -> {out}")


if __name__ == "__main__":
    main()
