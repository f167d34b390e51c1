"""Evaluation throughput: host per-image loops vs the batched device
path (decode + NMS + IoU matching on the accelerator,
ops/evalmatch.py).

Builds a synthetic decoded-prediction workload (v4-style 3-level grid
tensors + grid GTs) and times ``create_score_mat`` and ``PRfunc`` both
ways. The reference runs this stage as per-image x per-class host
Python (/root/reference/utils/measurement.py:107-136, :252-292) — at
real eval-set sizes it dominates wall-clock.

Usage: python tools/bench_eval.py [--n 512] [--size 416] [--classes 3]
Prints one JSON line per row.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_workload(n, size, classes, seed=0):
    rng = np.random.RandomState(seed)
    grids = [size // 32, size // 16, size // 8]
    b = 3                      # anchors per level
    preds = [rng.rand(n, g, g, b * (5 + classes)).astype(np.float32)
             for g in grids]
    for p, g in zip(preds, grids):
        s = p.reshape(n, g, g, b, 5 + classes)
        s[..., 2:4] = s[..., 2:4] * 0.3 + 0.05   # sane wh
        s[..., 4] *= 0.6                          # conf spread
    gts = np.zeros((n, grids[-1], grids[-1], 5 + classes), np.float32)
    for i in range(n):
        for _ in range(rng.randint(1, 6)):
            y, x = rng.randint(0, grids[-1], 2)
            gts[i, y, x, :4] = rng.rand(4) * 0.5 + 0.2
            gts[i, y, x, 4] = 1
            gts[i, y, x, 5 + rng.randint(classes)] = 1
    return gts, preds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--conf", type=float, default=0.5)
    ap.add_argument("--skip-host", action="store_true")
    args = ap.parse_args()

    from tf2_yolo_tpu.utils import create_score_mat, PRfunc

    gts, preds = make_workload(args.n, args.size, args.classes)
    names = [f"c{i}" for i in range(args.classes)]
    kw = dict(class_names=names, conf_threshold=args.conf, nms_mode=1,
              nms_threshold=0.5, iou_threshold=0.5, version=3)

    rows = []
    for fn, label in ((create_score_mat, "score_mat"),
                      (PRfunc, "prfunc")):
        for device in ((False, True) if not args.skip_host
                       else (True,)):
            t0 = time.perf_counter()
            fn(gts, *preds, device=device, **kw)
            dt = time.perf_counter() - t0
            if device:       # warm pass again (jit compiles once)
                t0 = time.perf_counter()
                fn(gts, *preds, device=True, **kw)
                dt = time.perf_counter() - t0
            rows.append({
                "eval_img_per_sec": round(args.n / dt, 1),
                "stage": label,
                "device": device,
                "n": args.n, "size": args.size,
                "classes": args.classes,
            })
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
