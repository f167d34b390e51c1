"""Demo: anchor fitting with k-means — the counterpart of the
reference's ``utils/kmeans.py`` ``__main__`` scatter-plot sanity check
(reference kmeans.py:104-128), run through BOTH implementations:

  - ``kmeans``      — NumPy determinism-parity path (seeded runs match
                      the reference exactly);
  - ``kmeans_jax``  — the vectorized on-device path (recommended).

Writes ``anchors_kmeans.png`` (scatter + fitted centers) and prints
both anchor sets.

    python examples/anchors_kmeans.py [--boxes 1000] [--k 5]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boxes", type=int, default=1000)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="anchors_kmeans.png")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from tf2_yolo_tpu.utils import kmeans, kmeans_jax, iou_dist

    # synthetic wh distribution: three size modes, like a detection set
    rng = np.random.RandomState(0)
    modes = [(0.08, 0.10, 0.03), (0.25, 0.35, 0.08), (0.6, 0.5, 0.1)]
    parts = [np.stack([np.abs(rng.normal(w, s, args.boxes // 3)),
                       np.abs(rng.normal(h, s, args.boxes // 3))], 1)
             for w, h, s in modes]
    boxes = np.clip(np.concatenate(parts), 0.01, 1.0)

    np.random.seed(5)
    centers_np = kmeans(boxes, args.k, iou_dist, stop_dist=1e-5,
                        verbose=False)
    centers_jx = np.asarray(kmeans_jax(boxes, args.k, seed=5))

    print("kmeans (reference-parity) anchors:")
    print(np.round(centers_np[np.argsort(centers_np.prod(1))], 4))
    print("kmeans_jax anchors:")
    print(np.round(centers_jx[np.argsort(centers_jx.prod(1))], 4))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.scatter(boxes[:, 0], boxes[:, 1], s=4, alpha=0.3,
                   label="boxes (w, h)")
        ax.scatter(centers_np[:, 0], centers_np[:, 1], marker="x",
                   s=120, c="red", label="kmeans")
        ax.scatter(centers_jx[:, 0], centers_jx[:, 1], marker="+",
                   s=140, c="black", label="kmeans_jax")
        ax.set_xlabel("w")
        ax.set_ylabel("h")
        ax.legend()
        fig.savefig(args.out, dpi=100)
        print("wrote", args.out)
    except ImportError:
        print("matplotlib unavailable; skipped the plot")


if __name__ == "__main__":
    main()
