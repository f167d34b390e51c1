"""Host-side utilities: decode/NMS parity paths, kmeans, measurement."""

from .tools import (read_img, down2xlabel, decode, nms, soft_nms,
                    cal_iou, get_class_weight, vis_img,
                    array_to_json, array_to_xml)
from .kmeans import (kmeans, kmeans_jax, iou, iou_dist,
                     euclidean_dist)
from .measurement import create_score_mat, PRfunc, PR_func

__all__ = [
    "read_img", "down2xlabel", "decode", "nms", "soft_nms", "cal_iou",
    "get_class_weight", "vis_img", "array_to_json", "array_to_xml",
    "kmeans", "kmeans_jax", "iou", "iou_dist", "euclidean_dist",
    "create_score_mat", "PRfunc", "PR_func",
]
