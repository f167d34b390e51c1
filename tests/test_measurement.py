"""Evaluation tests: score matrix and PR/mAP on hand-computed toy sets
(SURVEY.md §4: 'PR/mAP on a hand-computed toy detection set')."""

import numpy as np
import pytest

from tf2_yolo_tpu.utils import create_score_mat, PRfunc, PR_func


def grid_with_boxes(boxes, gh=4, gw=4, b=1, c=2):
    """Build a v2-layout (gh, gw, b*(5+c)) label from
    (cx, cy, w, h, conf, cls, prob) rows (normalized coords)."""
    label = np.zeros((gh, gw, b * (5 + c)))
    shaped = label.reshape(gh, gw, b, 5 + c)
    for cx, cy, w, h, conf, cls, prob in boxes:
        x_i = min(int(cx * gw), gw - 1)
        y_i = min(int(cy * gh), gh - 1)
        shaped[y_i, x_i, 0, :5] = [cx * gw - x_i, cy * gh - y_i, w, h,
                                   conf]
        shaped[y_i, x_i, 0, 5 + int(cls)] = prob
    return label


def test_score_mat_perfect_predictions():
    gt = [grid_with_boxes([(0.3, 0.3, 0.2, 0.2, 1, 0, 1),
                           (0.7, 0.7, 0.2, 0.2, 1, 1, 1)])]
    pred = [gt[0].copy()]
    table = create_score_mat(
        np.stack(gt), np.stack(pred),
        class_names=["a", "b"], conf_threshold=0.5,
        iou_threshold=0.5, version=2)
    assert list(table.columns) == ["precision", "recall", "F1-score",
                                   "gts", "dets"]
    np.testing.assert_allclose(table["precision"].values, [1, 1])
    np.testing.assert_allclose(table["recall"].values, [1, 1])
    np.testing.assert_allclose(table["F1-score"].values, [1, 1])
    assert list(table["gts"]) == [1, 1]
    assert list(table["dets"]) == [1, 1]


def test_score_mat_false_positive_and_miss():
    # GT: one class-a box. Pred: one matching class-a + one spurious
    # class-b far away.
    gt = [grid_with_boxes([(0.3, 0.3, 0.2, 0.2, 1, 0, 1)])]
    pred = [grid_with_boxes([(0.3, 0.3, 0.2, 0.2, 0.9, 0, 0.9),
                             (0.8, 0.8, 0.1, 0.1, 0.9, 1, 0.9)])]
    table = create_score_mat(
        np.stack(gt), np.stack(pred),
        class_names=["a", "b"], conf_threshold=0.5,
        iou_threshold=0.5, version=2)
    np.testing.assert_allclose(table.loc["a", "precision"], 1.0)
    np.testing.assert_allclose(table.loc["a", "recall"], 1.0)
    # class b: 1 det, 0 gt -> precision 0, recall nan (0/0)
    np.testing.assert_allclose(table.loc["b", "precision"], 0.0)
    assert np.isnan(table.loc["b", "recall"])


def test_score_mat_precision_modes():
    # two preds hit the SAME gt: TPP=2, TP=1, PP=2
    gt = [grid_with_boxes([(0.31, 0.31, 0.3, 0.3, 1, 0, 1)])]
    pred_label = grid_with_boxes([(0.30, 0.30, 0.3, 0.3, 0.9, 0, 0.9)],
                                 b=2)
    shaped = pred_label.reshape(4, 4, 2, 7)
    shaped[1, 1, 1, :5] = [0.24, 0.24, 0.3, 0.3, 0.8]   # second box
    shaped[1, 1, 1, 5] = 0.8
    pred = [pred_label]

    # mode 0: TPP/PP = 2/2 = 1
    t0 = create_score_mat(np.stack(gt), np.stack(pred),
                          class_names=["a", "b"], nms_mode=0,
                          precision_mode=0, version=2)
    np.testing.assert_allclose(t0.loc["a", "precision"], 1.0)
    # mode 2: TP/PP = 1/2
    t2 = create_score_mat(np.stack(gt), np.stack(pred),
                          class_names=["a", "b"], nms_mode=0,
                          precision_mode=2, version=2)
    np.testing.assert_allclose(t2.loc["a", "precision"], 0.5)
    # mode 1: TP/(PP-(TPP-TP)) = 1/(2-1) = 1
    t1 = create_score_mat(np.stack(gt), np.stack(pred),
                          class_names=["a", "b"], nms_mode=0,
                          precision_mode=1, version=2)
    np.testing.assert_allclose(t1.loc["a", "precision"], 1.0)


def make_toy_sweep():
    """2 images, 3 GT of class a; predictions with varying conf:
    conf 0.9 hit, conf 0.8 miss, conf 0.7 hit."""
    gt = [grid_with_boxes([(0.3, 0.3, 0.2, 0.2, 1, 0, 1),
                           (0.7, 0.7, 0.2, 0.2, 1, 0, 1)], c=1),
          grid_with_boxes([(0.3, 0.7, 0.2, 0.2, 1, 0, 1)], c=1)]
    pred = [grid_with_boxes([(0.3, 0.3, 0.2, 0.2, 0.9, 0, 1),
                             (0.52, 0.1, 0.1, 0.1, 0.8, 0, 1)], c=1),
            grid_with_boxes([(0.3, 0.7, 0.2, 0.2, 0.7, 0, 1)], c=1)]
    return np.stack(gt), np.stack(pred)


def test_prfunc_sweep_and_map():
    gt, pred = make_toy_sweep()
    pr = PRfunc(gt, pred, class_names=["a"], conf_threshold=0.05,
                nms_mode=0, iou_threshold=0.5, version=2)
    # sweep: conf order 0.9(hit) 0.8(miss) 0.7(hit)
    np.testing.assert_allclose(pr.precisions[0],
                               [1, 1 / 2, 2 / 3, 0])
    np.testing.assert_allclose(pr.recalls[0],
                               [1 / 3, 1 / 3, 2 / 3, 2 / 3])
    # precision-at-recall: recall 0.5 -> best precision at
    # recall > 0.5 is 2/3
    np.testing.assert_allclose(pr(0.5), 2 / 3)
    # recall beyond achieved -> 0
    assert pr(0.9) == 0

    # voc2007 11-point mAP: recalls <=1/3 -> max precision 1 at
    # recall>r... compute: r in {0,.1,.2,.3} -> 1; r in {.4,.5,.6} ->
    # 2/3; r in {.7,...,1} -> 0
    ap = pr.get_map("voc2007").loc["a", "ap"]
    np.testing.assert_allclose(ap, (4 * 1 + 3 * 2 / 3 + 4 * 0) / 11)

    area = pr.get_map("area").loc["a", "ap"]
    assert 0 < area <= 1
    smooth = pr.get_map("smootharea").loc["a", "ap"]
    assert smooth >= area - 1e-9
    # mAP row equals mean of per-class aps
    table = pr.get_map("voc2012")
    np.testing.assert_allclose(table.loc["mAP", "ap"],
                               table.iloc[:-1]["ap"].mean())


def test_prfunc_multilevel_inputs():
    """v3-style: GT at finest grid, preds given per level."""
    gt, pred = make_toy_sweep()
    pr = PRfunc(gt, pred, pred, class_names=["a"], nms_mode=1,
                version=2)
    assert len(pr.precisions) == 1


def test_pr_func_deprecation_alias():
    gt, pred = make_toy_sweep()
    with pytest.warns(Warning):
        PR_func(gt, pred, class_names=["a"], nms_mode=0, version=2)


def test_prfunc_class_index_bounds():
    gt, pred = make_toy_sweep()
    pr = PRfunc(gt, pred, class_names=["a"], nms_mode=0, version=2)
    with pytest.raises(IndexError):
        pr(0.5, class_idx=5)
