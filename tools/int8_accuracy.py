"""Measure the mAP cost of static-scale int8 inference on a TRAINED
model — the accuracy side of the int8 serving path (BASELINE.md
throughput rows; tests/test_quant.py bounds per-layer error on random
weights, this bounds end-task quality).

Trains YOLOv4 on the synthetic BCCD-shaped dataset (same generator,
imbalance, and scorer as tools/convergence_matrix.py), calibrates
int8 scales on a few training batches (export.calibrate_int8), and
scores held-out mAP@0.5 twice: the f32/bf16 forward vs the int8-conv
forward. Prints ONE JSON line.

    python tools/int8_accuracy.py --epochs 240 --images 48 --holdout 16
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convergence_matrix import (ANCHORS9, build_dataset,  # noqa: E402
                                eval_map)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--holdout", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=240)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--imbalance", default="0.7,0.2,0.1")
    ap.add_argument("--min-channels", type=int, default=256,
                    help="also score int8 with the serving-default "
                         "min-channel gate (layers under this many "
                         "output channels stay bf16; 0 skips the "
                         "gated pass)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_bench_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    probs = ([float(p) for p in args.imbalance.split(",")]
             if args.imbalance else None)
    facade, img, labels = build_dataset(4, args.size, args.classes,
                                        args.images, args.seed,
                                        class_probs=probs)
    facade.create_model(anchors=ANCHORS9.tolist())
    loss = facade.loss(binary_weight=[0.5] * 3)
    facade.model.compile("adam", learning_rate=args.lr, loss=loss)
    t0 = time.time()
    facade.model.fit(img, labels, epochs=args.epochs,
                     batch_size=args.batch_size, verbose=0)
    train_s = time.time() - t0

    from tf2_yolo_tpu.export import calibrate_int8
    module = facade.model.module
    variables = {"params": facade.model.params,
                 "batch_stats": facade.model.batch_stats}
    n_calib = min(16, len(img))
    quant = calibrate_int8(module, variables,
                           [img[i:i + 8] for i in range(0, n_calib, 8)])

    _, heldout_img, heldout_labels = build_dataset(
        4, args.size, args.classes, args.holdout, args.seed + 1000,
        class_probs=probs)

    fwd = jax.jit(lambda v, xb: module.apply(v, xb, train=False))
    x = jnp.asarray(heldout_img, jnp.float32)
    preds_f = [np.asarray(o) for o in fwd(variables, x)]
    preds_q = [np.asarray(o) for o in fwd({**variables, **quant}, x)]

    map_f = eval_map(heldout_labels, preds_f, facade.class_names, 4)
    map_q = eval_map(heldout_labels, preds_q, facade.class_names, 4)
    out = {
        "metric": "yolov4_int8_holdout_map@0.5_voc2012",
        "size": args.size, "images": args.images,
        "holdout": args.holdout, "epochs": args.epochs,
        "map_float": round(map_f, 4), "map_int8": round(map_q, 4),
        "map_delta": round(map_q - map_f, 4),
        "train_seconds": round(train_s, 1),
    }

    if args.min_channels:
        # The serving default (export_model int8_min_channels=256)
        # quantizes a strict subset of the ungated layers, so its
        # error is bounded by the ungated delta — but measure it
        # anyway. A FRESH jit is required: the gate is read at trace
        # time and the gated call's pytree matches the ungated one,
        # so reusing `fwd` would silently return the ungated program.
        from tf2_yolo_tpu.models.layers import set_int8_min_channels
        set_int8_min_channels(args.min_channels)
        try:
            fwd_g = jax.jit(
                lambda v, xb: module.apply(v, xb, train=False))
            preds_g = [np.asarray(o)
                       for o in fwd_g({**variables, **quant}, x)]
        finally:
            set_int8_min_channels(0)
        map_g = eval_map(heldout_labels, preds_g,
                         facade.class_names, 4)
        out["int8_min_channels"] = args.min_channels
        out["map_int8_gated"] = round(map_g, 4)
        out["map_delta_gated"] = round(map_g - map_f, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
