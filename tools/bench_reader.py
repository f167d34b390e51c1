"""Data-pipeline throughput: Python readers vs the C++ native loader,
and (optionally) an end-to-end annotated-dataset ``fit``.

Generates a synthetic labelimg dataset (PNG images + XML boxes, the
tests/helpers_data generator) at the training resolution, then times:

  - ``YoloDataSequence`` with ``reader="PIL"`` at 1 and N threads
    (the reference's only parallelism is this threaded reader,
    /root/reference/utils/tools.py:323-334);
  - ``reader="native"`` — the whole-batch C++ decode+parse+encode
    fast path (tf2_yolo_tpu/native/loader.cpp);
  - with ``--fit``: ``Model.fit`` of YOLOv4 fed by the native-reader
    sequence (label pyramid included), the number a user actually
    gets training from files.

Prints one JSON line per row.

Usage: python tools/bench_reader.py [--n 256] [--size 416]
       [--batch 128] [--threads 4] [--fit] [--epochs 3]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _time_sequence(seq, n):
    t0 = time.perf_counter()
    for i in range(len(seq)):
        seq[i]
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--src-size", type=int, default=None,
                    help="write source images at this size (default: "
                         "--size); a larger value measures the real "
                         "decode-big + resize-down ingest workload")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--fit", action="store_true")
    ap.add_argument("--uint8", action="store_true",
                    help="fit row feeds raw uint8 batches (on-device "
                         "normalization) — the recommended feed")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--prefetch", type=int, default=2)
    args = ap.parse_args()

    from tests.helpers_data import make_dataset
    from tf2_yolo_tpu.data import YoloDataSequence
    from tf2_yolo_tpu import native

    root = tempfile.mkdtemp(prefix="bench_reader_")
    names = [f"c{i}" for i in range(args.classes)]
    src_size = args.src_size or args.size
    img_dir, lab_dir = make_dataset(
        root, n_images=args.n, size=(src_size, src_size),
        class_names=tuple(names), max_boxes=4)

    grid = (args.size // 8, args.size // 8)    # v4 finest level
    rows = [("PIL", 1), ("PIL", args.threads)]
    if native.available():
        rows.append(("native", args.threads))
    else:
        print(json.dumps({"reader": "native",
                          "error": "libyolodata unavailable"}),
              flush=True)

    for reader, threads in rows:
        seq = YoloDataSequence(
            img_path=img_dir, label_path=lab_dir, reader=reader,
            batch_size=args.batch, size=(args.size, args.size),
            grid_shape=grid, class_names=names, shuffle=False,
            thread_num=threads)
        _time_sequence(seq, args.n)            # warm (page cache, .so)
        rate = _time_sequence(seq, args.n)
        print(json.dumps({
            "reader_img_per_sec": round(rate, 1),
            "reader": reader, "threads": threads,
            "size": args.size, "src_size": src_size,
            "batch": args.batch, "n": args.n,
        }), flush=True)

    if not args.fit:
        return

    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu import yolov4

    yolo = yolov4.Yolo(input_shape=(args.size, args.size, 3),
                       class_names=names)
    anchors = np.stack([np.linspace(0.05, 0.6, 9),
                        np.linspace(0.05, 0.5, 9)], axis=1).tolist()
    yolo.create_model(
        anchors=anchors,
        dtype=(jnp.bfloat16 if jax.devices()[0].platform != "cpu"
               else jnp.float32))
    seq = yolo.read_file_to_sequence(
        img_dir, lab_dir, batch_size=args.batch, shuffle=False,
        reader=("native" if native.available() else "PIL"),
        thread_num=args.threads, uint8=args.uint8)
    yolo.model.compile("adam", learning_rate=1e-3, loss=yolo.loss())
    hist = yolo.model.fit(seq, epochs=args.epochs, verbose=1,
                          prefetch=args.prefetch)
    times = hist["epoch_time"]
    steady = times[1:] if len(times) > 1 else times
    print(json.dumps({
        "fit_from_files_img_per_sec":
            round(args.n * len(steady) / sum(steady), 1),
        "epoch_s": [round(t, 2) for t in times],
        "reader": "native" if native.available() else "PIL",
        "prefetch": args.prefetch, "uint8": args.uint8,
        "size": args.size, "batch": args.batch, "n": args.n,
    }), flush=True)


if __name__ == "__main__":
    main()
