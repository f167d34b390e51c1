"""Demo: train briefly, then export + reload a serving artifact.

Shows the deployment path (BN folding + fixed-shape AOT program via
jax.export, optional TF SavedModel) on a tiny synthetic dataset.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/export_serving.py --cpu
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--saved-model", action="store_true",
                        help="also export a TF SavedModel (needs tf)")
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from helpers_data import make_dataset
    from tf2_yolo_tpu import yolov3
    from tf2_yolo_tpu.export import load_serving

    root = tempfile.mkdtemp(prefix="yolo_export_demo_")
    img_dir, lab_dir = make_dataset(root, n_images=8, size=(96, 96),
                                    class_names=("square", "bar"))

    yolo = yolov3.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    anchors = np.stack([np.linspace(0.1, 0.8, 6),
                        np.linspace(0.1, 0.7, 6)], axis=1)
    yolo.create_model(anchors=anchors, backbone="tiny_darknet",
                      pretrained_body=None)
    img, labels = yolo.read_file_to_dataset(img_dir, lab_dir)
    yolo.model.compile("adam", learning_rate=1e-3,
                       loss=yolo.loss(binary_weight=[0.5] * 2))
    yolo.model.fit(img, labels, epochs=args.epochs, batch_size=8,
                   verbose=0)

    artifact = os.path.join(root, "model.serving")
    yolo.export_model(artifact, batch_size=4, threshold=0.3,
                      max_boxes=32)
    print(f"exported {os.path.getsize(artifact)/1e6:.1f} MB "
          f"-> {artifact}")

    serve = load_serving(artifact)
    rows, keep = serve(np.asarray(img[:4], np.float32))
    n_det = int(np.asarray(keep).sum())
    print(f"reloaded artifact: {n_det} detections on 4 images, "
          f"rows {rows.shape}")

    if args.saved_model:
        from tf2_yolo_tpu.export import save_saved_model
        sm_dir = os.path.join(root, "saved_model")
        save_saved_model(
            sm_dir, yolo.model.module,
            {"params": yolo.model.params,
             "batch_stats": yolo.model.batch_stats},
            input_shape=yolo.input_shape, batch_size=4,
            class_num=yolo.class_num, version=yolo.version,
            threshold=0.3, max_boxes=32)
        print(f"TF SavedModel -> {sm_dir}")


if __name__ == "__main__":
    main()
