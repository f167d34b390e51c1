"""End-to-end ``Model.fit`` throughput vs the raw jitted step rate.

bench.py times the bare train step with device-resident inputs; real
training pays host->device feeding on top (on this CI box the remote
tunnel moves ~1 GB/s, and a 416x416x3 f32 batch of 128 is 266 MB —
comparable to the 286 ms step itself). This tool measures what a user
actually gets from ``Model.fit`` on synthetic data, so the feeding
overlap (async dispatch + optional look-ahead prefetch) is a measured
number, not an assumption.

Usage:  python tools/bench_fit.py [--batch 128] [--size 416]
        [--n 256] [--epochs 3] [--prefetch 2]
        [--checkpoint none|sync|async]

``--checkpoint`` saves the full Orbax train state every epoch
(checkpoint_every=1) so the per-epoch cost of sync vs async
(background-write) checkpointing is a measured number.

Prints one JSON line per configuration:
  {"fit_img_per_sec": ..., "epoch_s": [...], "prefetch": N}
The first epoch (compile) is excluded from the rate.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--prefetch", type=int, default=None,
                    help="fit(prefetch=) values to test; default: "
                         "engine default only")
    ap.add_argument("--checkpoint",
                    choices=["none", "sync", "async", "all"],
                    default="none",
                    help="save full Orbax train state every epoch; "
                         "'all' measures none/sync/async in one "
                         "process (one compile)")
    ap.add_argument("--uint8", action="store_true",
                    help="feed raw uint8 batches, normalized on "
                         "device (4x less host->device traffic)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.engine import Model
    from tf2_yolo_tpu.models import YoloV4
    from tf2_yolo_tpu.ops import wrap_yolo_loss_v4

    size, b, n, cls = args.size, args.batch, args.n, args.classes
    # mirror bench.py's config exactly (same anchors/labels/dtype) so
    # the fit rate is comparable to the raw-step img/s it reports
    anchors = np.stack([np.linspace(0.05, 0.75, 9),
                        np.linspace(0.07, 0.65, 9)], axis=1)
    grids = [(size // 32, size // 32), (size // 16, size // 16),
             (size // 8, size // 8)]
    compute_dtype = (jnp.bfloat16
                     if jax.devices()[0].platform != "cpu"
                     else jnp.float32)

    model = Model(YoloV4(anchors=anchors, class_num=cls,
                         dtype=compute_dtype),
                  (size, size, 3), seed=0)
    losses = [wrap_yolo_loss_v4(g, 3, cls,
                                anchors[3 * i:3 * i + 3])
              for i, g in enumerate(grids)]
    model.compile("adam", loss=losses, learning_rate=1e-3)

    rng = np.random.RandomState(0)
    x = rng.rand(n, size, size, 3).astype(np.float32)
    if args.uint8:
        x = np.round(x * 255).astype(np.uint8)
    ys = [np.zeros((n, g[0], g[1], 5 + cls), np.float32)
          for g in grids]
    for y, g in zip(ys, grids):
        y[:, 0, 0, :4] = [0.5, 0.5, 0.2, 0.2]
        y[:, 0, 0, 4] = 1
        y[:, 0, 0, 5] = 1

    base_kwargs = {}
    if args.prefetch is not None:
        base_kwargs["prefetch"] = args.prefetch

    def ck_kwargs(mode):
        if mode == "none":
            return dict(base_kwargs)
        import tempfile
        return dict(base_kwargs,
                    checkpoint_dir=tempfile.mkdtemp(prefix="bench_ck_"),
                    checkpoint_every=1,
                    checkpoint_async=(mode == "async"))

    # metric naming: the no-checkpoint path reports steady-state
    # (compile epoch excluded) as fit_img_per_sec; the checkpoint
    # branch times whole warmed fit() calls and reports
    # fit_wall_img_per_sec — different denominators, so they get
    # different keys (comparable only within their own mode)
    if args.checkpoint == "none":
        hist = model.fit(x, ys, epochs=args.epochs, batch_size=b,
                         shuffle=False, verbose=1, **base_kwargs)
        times = hist["epoch_time"]
        steady = times[1:] if len(times) > 1 else times
        rows = [("none", n * len(steady) / sum(steady),
                 [round(t, 2) for t in times])]
    else:
        # fit records epoch_time BEFORE the end-of-epoch checkpoint, so
        # checkpoint cost only shows in wall time: warm up (compile)
        # with one checkpoint-free epoch, then time whole fit() calls
        model.fit(x, ys, epochs=1, batch_size=b, shuffle=False,
                  verbose=0, **base_kwargs)
        modes = (["none", "sync", "async"]
                 if args.checkpoint == "all" else [args.checkpoint])
        rows = []
        for mode in modes:
            t0 = time.time()
            model.fit(x, ys, epochs=args.epochs, batch_size=b,
                      shuffle=False, verbose=0, **ck_kwargs(mode))
            wall = time.time() - t0
            rows.append((mode, n * args.epochs / wall,
                         [round(wall, 2)]))
    key = ("fit_img_per_sec" if args.checkpoint == "none"
           else "fit_wall_img_per_sec")
    for mode, rate, times in rows:
        print(json.dumps({
            key: round(rate, 1),
            "epoch_s": times,
            "prefetch": args.prefetch,
            "checkpoint": mode,
            "uint8": args.uint8,
            "batch": b, "size": size, "n": n,
        }), flush=True)


if __name__ == "__main__":
    main()
