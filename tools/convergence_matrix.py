"""Convergence matrix: same synthetic dataset, same eval protocol,
train either THIS framework or the EXECUTED tf.keras reference, and
report mAP@0.5 (PRfunc, voc2012 mode).

This is the learning-dynamics cross-check demanded by the round-1
verdict (only v2/v4 had one): every loss family (v1-v4) gets a
measured "does it actually learn, and does the reference learn the
same way on identical data" datapoint, standing in for the BCCD/raccoon
mAP rows until those datasets are reachable (BASELINE.md).

Both systems read the SAME generated dataset and are scored by the
SAME evaluator (our PRfunc — parity-tested against the reference's
measurement protocol). The reference side builds the actual reference
model + loss modules via importlib injection (its package __init__
needs imgaug/bs4 which are absent; the model/loss files need only tf)
and trains with tf.keras in legacy-keras mode.

Usage:
    python tools/convergence_matrix.py --version 4 --system ours
    python tools/convergence_matrix.py --version 1 --system reference \
        --epochs 40
Prints one JSON line per run.
"""

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REF = "/root/reference"
DEFAULT_SIZE = {1: 128, 2: 96, 3: 96, 4: 96}
ANCHORS2 = np.array([[0.25, 0.25], [0.4, 0.15]], np.float32)
ANCHORS9 = np.stack([np.linspace(0.1, 0.9, 9),
                     np.linspace(0.15, 0.8, 9)], axis=1).astype(
    np.float32)


def build_dataset(version, size, classes, n_images, seed,
                  class_probs=None):
    """Synthetic images + annotations -> (imgs, labels) via this
    framework's facade reader (the encoding semantics are
    parity-tested, so both systems can train on it).
    ``class_probs`` biases class sampling (BCCD-shaped imbalance)."""
    import tempfile
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from helpers_data import make_dataset

    tmp = tempfile.mkdtemp(prefix="conv_matrix_")
    class_names = [f"c{i}" for i in range(classes)]
    img_dir, lab_dir = make_dataset(
        tmp, n_images=n_images, size=(size, size),
        class_names=tuple(class_names), label_format="labelimg",
        seed=seed, class_probs=class_probs)
    facade = make_facade(version, size, class_names)
    img, labels = facade.read_file_to_dataset(img_dir, lab_dir)
    return facade, img, labels


def make_facade(version, size, class_names):
    from tf2_yolo_tpu import yolov1_5, yolov2, yolov3, yolov4
    shape = (size, size, 3)
    if version == 1:
        return yolov1_5.Yolo(input_shape=shape, class_names=class_names)
    if version == 2:
        return yolov2.Yolo(input_shape=shape, class_names=class_names)
    if version == 3:
        return yolov3.Yolo(input_shape=shape, class_names=class_names)
    return yolov4.Yolo(input_shape=shape, class_names=class_names)


def eval_map(labels, preds, class_names, version):
    """mAP@0.5 via this framework's PRfunc — the shared scorer."""
    from tf2_yolo_tpu.utils import PRfunc
    if version <= 2:
        pr = PRfunc(labels, preds, class_names=class_names,
                    version=version)
    else:
        # GT at finest grid; preds fine -> coarse (reference
        # README.md:366-376 convention)
        pr = PRfunc(labels[-1], *preds[::-1], class_names=class_names,
                    version=version)
    table = pr.get_map(mode="voc2012")     # DataFrame, last row = mAP
    return float(table["ap"].iloc[-1])


def run_ours(version, size, classes, n_images, epochs, batch_size,
             lr, seed, holdout=0, class_probs=None):
    facade, img, labels = build_dataset(version, size, classes,
                                        n_images, seed,
                                        class_probs=class_probs)
    if version == 1:
        facade.create_model(bbox_num=2)
        loss = facade.loss(binary_weight=0.5)
    elif version == 2:
        facade.create_model(anchors=ANCHORS2.tolist())
        loss = facade.loss(binary_weight=0.5)
    else:
        facade.create_model(anchors=ANCHORS9.tolist())
        bw = [0.5] * 3
        loss = facade.loss(binary_weight=bw)
    facade.model.compile("adam", learning_rate=lr, loss=loss)
    t0 = time.time()
    facade.model.fit(img, labels, epochs=epochs,
                     batch_size=batch_size, verbose=0)
    train_s = time.time() - t0
    if holdout:
        # held-out eval split: same generator, disjoint seed
        _, img, labels = build_dataset(version, size, classes,
                                       holdout, seed + 1000,
                                       class_probs=class_probs)
    preds = facade.model.predict(img)
    m = eval_map(labels, preds, facade.class_names, version)
    return m, train_s


def _load_ref_module(relpath, name, pkg_dir=None):
    path = os.path.join(REF, relpath)
    spec = importlib.util.spec_from_file_location(
        name, path,
        submodule_search_locations=[pkg_dir] if pkg_dir else None)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def build_ref_model(version, size, classes):
    name = {1: "yolov1_5", 2: "yolov2", 3: "yolov3", 4: "yolov4"}[
        version]
    pkg_dir = os.path.join(REF, name, "models")
    pkg = _load_ref_module(os.path.join(name, "models", "__init__.py"),
                           f"ref{name}models", pkg_dir)
    if version == 1:
        body = pkg.yolo_body((size, size, 3))
        return pkg.yolo_head(body, bbox_num=2, class_num=classes)
    if version == 2:
        body = pkg.yolo_body((size, size, 3), backbone="darknet")
        return pkg.yolo_head(body, classes, ANCHORS2)
    if version == 3:
        body = pkg.yolo_body((size, size, 3), pretrained_weights=None)
        return pkg.yolo_head(body, classes, ANCHORS9)
    body = pkg.yolo_body((size, size, 3))
    return pkg.yolo_head(body, classes, ANCHORS9)


def build_ref_losses(version, size, classes):
    name = {1: "yolov1_5", 2: "yolov2", 3: "yolov3", 4: "yolov4"}[
        version]
    mod = _load_ref_module(os.path.join(name, "losses", "loss.py"),
                           f"ref{name}loss")
    g = size // 64 if version == 1 else size // 32
    if version == 1:
        return mod.wrap_yolo_loss((g, g), 2, classes,
                                  binary_weight=0.5)
    if version == 2:
        return mod.wrap_yolo_loss((g, g), 2, classes, ANCHORS2,
                                  binary_weight=0.5)
    losses = []
    for level in range(3):
        gl = g * 2 ** level
        losses.append(mod.wrap_yolo_loss(
            (gl, gl), 3, classes, ANCHORS9[3 * level:3 * level + 3],
            binary_weight=0.5))
    return losses


def run_reference(version, size, classes, n_images, epochs,
                  batch_size, lr, seed, holdout=0, class_probs=None):
    if os.environ.get("TF_USE_LEGACY_KERAS") != "1":
        # legacy keras must be chosen before TF imports anywhere
        env = dict(os.environ, TF_USE_LEGACY_KERAS="1")
        import subprocess
        r = subprocess.run([sys.executable] + sys.argv, env=env)
        sys.exit(r.returncode)
    if not os.path.isdir(REF):
        raise SystemExit("reference checkout not available")
    import tensorflow as tf
    # TF-CPU grappler tries to remap BatchNorm+Mish into a fused op it
    # has no kernel for ("Fusion is not implemented: [FusedBatchNorm,
    # Mish]" at predict time on the v4 reference model) — disable the
    # remapper so the reference graph runs as written.
    tf.config.optimizer.set_experimental_options({"remapping": False})

    _, img, labels = build_dataset(version, size, classes, n_images,
                                   seed, class_probs=class_probs)
    model = build_ref_model(version, size, classes)
    loss = build_ref_losses(version, size, classes)
    model.compile(tf.keras.optimizers.Adam(learning_rate=lr),
                  loss=loss)
    y = list(labels) if isinstance(labels, list) else labels
    t0 = time.time()
    model.fit(img, y, epochs=epochs, batch_size=batch_size, verbose=0)
    train_s = time.time() - t0
    if holdout:
        _, img, labels = build_dataset(version, size, classes,
                                       holdout, seed + 1000,
                                       class_probs=class_probs)
    preds = model.predict(img, verbose=0)
    class_names = [f"c{i}" for i in range(classes)]
    m = eval_map(labels, preds, class_names, version)
    return m, train_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--version", type=int, required=True,
                    choices=[1, 2, 3, 4])
    ap.add_argument("--system", choices=["ours", "reference"],
                    default="ours")
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--classes", type=int, default=2)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    ap.add_argument("--holdout", type=int, default=0,
                    help="eval on N held-out images (disjoint seed) "
                         "instead of the training set")
    ap.add_argument("--imbalance", default=None,
                    help="comma class probs, e.g. 0.7,0.2,0.1 "
                         "(BCCD-shaped rare-class check)")
    ap.add_argument("--bn-sg", action="store_true",
                    help="ours only: frozen-statistics BatchNorm "
                         "backward (set_bn_stats_stop_gradient) — "
                         "the convergence check for the BENCH_BN_SG "
                         "speed knob")
    ap.add_argument("--bn-sg-scope", default=None,
                    help="restrict --bn-sg to modules whose path "
                         "contains this name (e.g. backbone)")
    ap.add_argument("--kernel-init", choices=["default", "glorot"],
                    default="default",
                    help="'default' = the per-family reference inits "
                         "(he_normal v1-v3, RandomNormal 0.02 v4 — "
                         "models/layers.py); 'glorot' patches the "
                         "body/neck conv inits to glorot_uniform for "
                         "the recipe A/B (v4 head convs keep the "
                         "reference normal-0.02, as in the round-4 "
                         "arm; v2/v3 head convs keep he_normal)")
    args = ap.parse_args()
    class_probs = ([float(x) for x in args.imbalance.split(",")]
                   if args.imbalance else None)
    if class_probs is not None:
        assert len(class_probs) == args.classes

    size = args.size or DEFAULT_SIZE[args.version]
    if args.platform and args.system == "ours":
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.bn_sg:
        assert args.system == "ours", "--bn-sg only applies to ours"
        from tf2_yolo_tpu.models.layers import set_bn_stats_stop_gradient
        set_bn_stats_stop_gradient(True, scope=args.bn_sg_scope)

    if args.kernel_init == "glorot":
        assert args.system == "ours", "--kernel-init applies to ours"
        from flax import linen as nn
        from tf2_yolo_tpu.models import layers, backbones, detectors
        g = nn.initializers.glorot_uniform()
        # the init names are read from these module namespaces at
        # trace time, so rebinding them before model build is enough
        layers.HE_NORMAL = layers.DARKNET_NORMAL = g
        backbones.DARKNET_NORMAL = g
        detectors.DARKNET_NORMAL = g

    fn = run_ours if args.system == "ours" else run_reference
    m, train_s = fn(args.version, size, args.classes, args.images,
                    args.epochs, args.batch_size, args.lr, args.seed,
                    holdout=args.holdout, class_probs=class_probs)
    key = ("map@0.5_voc2012_holdout" if args.holdout
           else "map@0.5_voc2012_trainset")
    print(json.dumps({
        "system": args.system, "version": args.version, "size": size,
        "classes": args.classes, "images": args.images,
        "epochs": args.epochs, "imbalance": args.imbalance,
        "holdout": args.holdout, "bn_sg": args.bn_sg,
        "bn_sg_scope": args.bn_sg_scope,
        key: round(m, 4),
        "train_seconds": round(train_s, 1),
    }))


if __name__ == "__main__":
    main()
