"""API-surface parity: our public signatures vs the REAL reference.

Imports the actual reference package from /root/reference (with a stub
for the absent ``imgaug`` dependency) and asserts, for every public
facade method and utils function, that our signature is a compatible
superset of the reference's:

  - every reference parameter exists at the same positional slot (or
    is absorbed by a matching *args), with an EQUAL default;
  - any parameter we add on top is optional and sits after the
    reference's, so every reference call site runs unchanged.

This is the executable form of the migration contract (SURVEY.md
§7.1, docs/MIGRATION.md): code written against samson6460/tf2_YOLO
calls these entry points positionally and by keyword, so a drifted
name or default is an API break even when the math is parity-tested.
"""

import importlib
import inspect
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"
_REF_TOP_LEVEL = ("utils", "yolov1_5", "yolov2", "yolov3", "yolov4")

pytest.importorskip("tensorflow")  # reference facades import tf.keras


@pytest.fixture(scope="module")
def ref():
    """Import the reference package with an imgaug stub; clean up the
    injected modules afterwards so other tests' importlib tricks (e.g.
    test_reference_parity's fake yolovN packages) are unaffected."""
    saved_modules = {}
    injected = []

    def _inject(name, mod):
        if name in sys.modules:
            saved_modules[name] = sys.modules[name]
        sys.modules[name] = mod
        injected.append(name)

    ia = types.ModuleType("imgaug")
    ia_aug = types.ModuleType("imgaug.augmentables")
    ia_bbs = types.ModuleType("imgaug.augmentables.bbs")
    ia_bbs.BoundingBox = type("BoundingBox", (), {})
    ia_bbs.BoundingBoxesOnImage = type("BoundingBoxesOnImage", (), {})
    ia.augmentables = ia_aug
    ia_aug.bbs = ia_bbs
    _inject("imgaug", ia)
    _inject("imgaug.augmentables", ia_aug)
    _inject("imgaug.augmentables.bbs", ia_bbs)
    for name in _REF_TOP_LEVEL:
        for key in list(sys.modules):
            if key == name or key.startswith(name + "."):
                saved_modules.setdefault(key, sys.modules.pop(key))

    sys.path.insert(0, REF_ROOT)
    try:
        mods = {name: importlib.import_module(name)
                for name in _REF_TOP_LEVEL}
        mods["utils.tools"] = importlib.import_module("utils.tools")
        mods["utils.kmeans"] = importlib.import_module("utils.kmeans")
        mods["utils.measurement"] = importlib.import_module(
            "utils.measurement")
        yield mods
    finally:
        # the reference __init__ files append their parent dir too
        while REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
        for key in list(sys.modules):
            if any(key == n or key.startswith(n + ".")
                   for n in _REF_TOP_LEVEL) or key.startswith("imgaug"):
                del sys.modules[key]
        sys.modules.update(saved_modules)


def _deq(a, b):
    """Default-value equality tolerant of list/array defaults."""
    if a is b:
        return True
    try:
        return bool(np.array_equal(a, b))
    except Exception:
        return a == b


def assert_sig_superset(name, ours, reference):
    P = inspect.Parameter
    rp = [p for p in inspect.signature(reference).parameters.values()
          if p.name != "self"]
    op = [p for p in inspect.signature(ours).parameters.values()
          if p.name != "self"]
    o_by_name = {p.name: p for p in op}
    o_var_pos = any(p.kind is P.VAR_POSITIONAL for p in op)
    o_var_kw = any(p.kind is P.VAR_KEYWORD for p in op)

    oi = 0
    for p in rp:
        target = None
        if p.kind is P.VAR_POSITIONAL:
            assert o_var_pos, (
                f"{name}: reference takes *{p.name}; ours has no "
                "VAR_POSITIONAL")
            while oi < len(op) and op[oi].kind is not P.VAR_POSITIONAL:
                oi += 1
            oi += 1
            continue
        if p.kind is P.VAR_KEYWORD:
            assert o_var_kw, (
                f"{name}: reference takes **{p.name}; ours has no "
                "VAR_KEYWORD")
            continue
        if p.kind in (P.POSITIONAL_ONLY, P.POSITIONAL_OR_KEYWORD):
            if oi < len(op) and op[oi].kind in (P.POSITIONAL_ONLY,
                                                P.POSITIONAL_OR_KEYWORD):
                assert op[oi].name == p.name, (
                    f"{name}: positional slot {oi} is "
                    f"{op[oi].name!r}, reference has {p.name!r}")
                target = op[oi]
                oi += 1
            elif oi < len(op) and op[oi].kind is P.VAR_POSITIONAL:
                pass  # absorbed (e.g. v1 vis_img label_data -> *label_datas)
            else:
                raise AssertionError(
                    f"{name}: no positional slot for reference "
                    f"parameter {p.name!r}")
        else:  # KEYWORD_ONLY
            target = o_by_name.get(p.name)
            assert target is not None or o_var_kw, (
                f"{name}: missing keyword parameter {p.name!r}")
        if target is not None and p.default is not P.empty:
            assert target.default is not P.empty and \
                _deq(target.default, p.default), (
                    f"{name}: default of {p.name!r} is "
                    f"{target.default!r}, reference has {p.default!r}")

    # Anything we add must be optional, so reference call sites work.
    ref_names = {p.name for p in rp}
    for q in op:
        if q.kind in (P.VAR_POSITIONAL, P.VAR_KEYWORD):
            continue
        if q.name not in ref_names:
            assert q.default is not P.empty, (
                f"{name}: added parameter {q.name!r} has no default — "
                "reference-style calls would break")


_FACADE_METHODS = ("__init__", "create_model", "read_file_to_dataset",
                   "read_file_to_sequence", "vis_img", "loss", "metrics")


@pytest.mark.parametrize("version", ["yolov1_5", "yolov2", "yolov3",
                                     "yolov4"])
def test_facade_signatures(ref, version):
    ref_cls = ref[version].Yolo
    our_cls = importlib.import_module(f"tf2_yolo_tpu.{version}").Yolo
    methods = _FACADE_METHODS + (("reshape_anchors",)
                                 if version == "yolov4" else ())
    for m in methods:
        assert_sig_superset(f"{version}.Yolo.{m}",
                            getattr(our_cls, m), getattr(ref_cls, m))


def test_v4_anchor_properties(ref):
    """The v4 anchor-state surface: properties with setters, plus the
    trainability toggle (reference yolov4/__init__.py:100-167)."""
    our_cls = importlib.import_module("tf2_yolo_tpu.yolov4").Yolo
    ref_cls = ref["yolov4"].Yolo
    for prop in ("model", "file_names", "anchors", "anchors_trainable"):
        assert isinstance(getattr(ref_cls, prop), property)
        ours = getattr(our_cls, prop)
        assert isinstance(ours, property), f"yolov4.Yolo.{prop}"
        # superset rule: every reference setter must exist (extra
        # setters on our side are additions, not breaks)
        if getattr(ref_cls, prop).fset is not None:
            assert ours.fset is not None, f"yolov4.Yolo.{prop} setter"


_TOOLS_FUNCS = ("read_img", "decode", "nms", "soft_nms", "cal_iou",
                "get_class_weight", "down2xlabel", "vis_img",
                "array_to_json", "array_to_xml")


def test_tools_signatures(ref):
    ours = sys.modules[importlib.import_module(
        "tf2_yolo_tpu.utils.tools").__name__]
    for f in _TOOLS_FUNCS:
        assert_sig_superset(f"tools.{f}", getattr(ours, f),
                            getattr(ref["utils.tools"], f))
    from tf2_yolo_tpu.data.dataset import YoloDataSequence
    assert_sig_superset("YoloDataSequence.__init__",
                        YoloDataSequence.__init__,
                        ref["utils.tools"].YoloDataSequence.__init__)


def test_kmeans_signatures(ref):
    ours = sys.modules["tf2_yolo_tpu.utils.kmeans"] \
        if "tf2_yolo_tpu.utils.kmeans" in sys.modules \
        else importlib.import_module("tf2_yolo_tpu.utils.kmeans")
    ours = sys.modules["tf2_yolo_tpu.utils.kmeans"]
    for f in ("kmeans", "iou", "iou_dist", "euclidean_dist"):
        assert_sig_superset(f"kmeans.{f}", getattr(ours, f),
                            getattr(ref["utils.kmeans"], f))


def test_measurement_signatures(ref):
    importlib.import_module("tf2_yolo_tpu.utils.measurement")
    ours = sys.modules["tf2_yolo_tpu.utils.measurement"]
    rm = ref["utils.measurement"]
    assert_sig_superset("measurement.create_score_mat",
                        ours.create_score_mat, rm.create_score_mat)
    for m in ("__init__", "get_map", "plot_pr_curve"):
        assert_sig_superset(f"PRfunc.{m}", getattr(ours.PRfunc, m),
                            getattr(rm.PRfunc, m))
    assert issubclass(ours.PR_func, ours.PRfunc)  # deprecated alias


def test_module_level_exports(ref):
    """Every public name the reference exposes at module level exists
    in our counterpart module (call-compatibility of `from x import y`
    migration lines)."""
    pairs = [
        (ref["utils.tools"], "tf2_yolo_tpu.utils.tools",
         _TOOLS_FUNCS + ("YoloDataSequence", "create_score_mat")),
        (ref["utils.kmeans"], "tf2_yolo_tpu.utils.kmeans",
         ("kmeans", "iou", "iou_dist", "euclidean_dist")),
        (ref["utils.measurement"], "tf2_yolo_tpu.utils.measurement",
         ("create_score_mat", "PRfunc", "PR_func")),
    ]
    for ref_mod, our_name, names in pairs:
        importlib.import_module(our_name)
        our_mod = sys.modules[our_name]
        for n in names:
            assert hasattr(ref_mod, n), f"reference lost {n}?"
            assert hasattr(our_mod, n), f"{our_name} missing {n}"
