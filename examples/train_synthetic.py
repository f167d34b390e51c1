"""End-to-end demo: synthetic dataset -> k-means anchors -> train
YOLOv2 -> evaluate mAP -> export annotations -> save weights.

Runs on whatever accelerator JAX finds (TPU if available). For a
CPU-only dry run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_synthetic.py --cpu
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
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--images", type=int, default=16)
    parser.add_argument("--size", type=int, default=128)
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from helpers_data import make_dataset
    from tf2_yolo_tpu import yolov2
    from tf2_yolo_tpu.utils import (PRfunc, create_score_mat, kmeans,
                                    iou_dist, get_class_weight,
                                    array_to_xml, decode)

    root = tempfile.mkdtemp(prefix="yolo_demo_")
    img_dir, lab_dir = make_dataset(root, n_images=args.images,
                                    size=(args.size, args.size))
    class_names = ["square", "bar"]

    yolo = yolov2.Yolo(input_shape=(args.size, args.size, 3),
                       class_names=class_names)

    # 1. read dataset
    img, label = yolo.read_file_to_dataset(
        img_dir, lab_dir, encoding="utf-8", shuffle=False)
    print(f"\ndataset: {img.shape}, objects "
          f"{int(label[..., 4].sum())}")

    # 2. fit anchors with k-means over GT wh
    gt = decode(*(label[i] for i in range(len(label))),
                class_num=2, threshold=0.5, version=2)
    np.random.seed(0)
    anchors = kmeans(gt[:, 2:4], n_cluster=3, dist_func=iou_dist,
                     stop_dist=0.01, verbose=False)
    anchors = anchors[np.argsort(-anchors.prod(1))]
    print("anchors:", np.round(anchors, 3).tolist())

    # 3. build + train
    yolo.create_model(anchors=anchors.tolist())
    bw = float(get_class_weight(label[..., 4:5], "binary")[0])
    yolo.model.compile("adam", learning_rate=1e-3,
                       loss=yolo.loss(binary_weight=bw),
                       metrics=yolo.metrics("obj+iou+recall0.5"))
    yolo.model.fit(img, label, epochs=args.epochs, batch_size=8,
                   verbose=1)

    # 4. predict + evaluate
    pred = yolo.model.predict(img)
    print(create_score_mat(label, pred, class_names=class_names,
                           conf_threshold=0.3, nms_mode=1, version=2))
    pr = PRfunc(label, pred, class_names=class_names, nms_mode=1,
                version=2)
    print(pr.get_map(mode="voc2012"))

    # 5. export one prediction as labelimg XML, save weights
    xml_path = os.path.join(root, "pred_000.xml")
    array_to_xml(xml_path, (args.size, args.size), pred[0],
                 class_names=class_names, conf_threshold=0.3,
                 nms_mode=1, version=2)
    weights = os.path.join(root, "model.msgpack")
    yolo.model.save_weights(weights)
    print(f"\nexported {xml_path}\nsaved weights {weights}")


if __name__ == "__main__":
    main()
