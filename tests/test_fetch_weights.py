"""fetch_weights tool: download/checksum/asset/convert plumbing,
exercised hermetically via file:// URLs (the box has zero egress;
the real GitHub-release URLs are pinned in the manifest and the tool
is a per-item no-op when they are unreachable)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools"))

import fetch_weights


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    d = tmp_path / "cache"
    monkeypatch.setenv("TF2_YOLO_TPU_WEIGHTS", str(d))
    return d


def test_offline_is_per_item_noop(cache):
    lock = {}
    msg = fetch_weights.fetch_one(
        "pascal_voc", fetch_weights.MANIFEST["pascal_voc"], lock)
    assert "skipped" in msg
    assert lock == {}


def test_fetch_records_checksum_and_verifies(cache, tmp_path):
    src = tmp_path / "payload.bin"
    src.write_bytes(b"weights!" * 100)
    spec = {"url": src.as_uri(), "file": "payload.bin", "convert": None}

    lock = {}
    msg = fetch_weights.fetch_one("payload", spec, lock)
    assert "raw artifact cached" in msg
    assert len(lock["payload"]["sha256"]) == 64

    # corrupt the cached copy: re-fetch must flag the mismatch
    cached = cache / "payload.bin"
    cached.write_bytes(b"tampered")
    msg = fetch_weights.fetch_one("payload", spec, lock)
    assert "checksum mismatch" in msg
    assert (cache / "payload.bin.corrupt").exists()


def test_asset_install(cache, tmp_path):
    names = tmp_path / "names.txt"
    names.write_text("n001,thing\nn002,other\n")
    asset_dir = tmp_path / "assets"
    asset_dir.mkdir()
    spec = {"url": names.as_uri(), "file": "imagenet_classnames.txt",
            "convert": None, "asset": "imagenet_classnames.txt"}
    msg = fetch_weights.fetch_one("imagenet_classnames", spec, {},
                                  asset_dir=str(asset_dir))
    assert "asset installed" in msg
    assert (asset_dir / "imagenet_classnames.txt").read_text() \
        == names.read_text()


def test_conversion_failure_keeps_raw(cache, tmp_path):
    bad = tmp_path / "bad.h5"
    bad.write_bytes(b"not an h5 file")
    spec = {"url": bad.as_uri(), "file": "bad.h5",
            "convert": {"version": 4, "class_num": 80,
                        "input_shape": (64, 64, 3), "name": "x"}}
    msg = fetch_weights.fetch_one("bad", spec, {})
    assert "conversion failed" in msg
    assert (cache / "bad.h5").exists()


def test_main_list_runs(cache, capsys):
    assert fetch_weights.main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "ms_coco" in out and "github.com/samson6460" in out


def test_lock_written_by_main(cache, tmp_path):
    src = tmp_path / "f.bin"
    src.write_bytes(b"z")
    fetch_weights.MANIFEST["_tmp_test"] = {
        "url": src.as_uri(), "file": "f.bin", "convert": None}
    try:
        assert fetch_weights.main(["--only", "_tmp_test"]) == 0
    finally:
        del fetch_weights.MANIFEST["_tmp_test"]
    lock = json.loads((cache / "fetch_manifest.lock.json").read_text())
    assert "_tmp_test" in lock


def test_from_dir_ingests_without_network(cache, tmp_path):
    # a "checkout" holding the artifact under a nested path, found by
    # the upstream URL's file name
    checkout = tmp_path / "upstream" / "yolov3" / "models"
    checkout.mkdir(parents=True)
    (checkout / "imagenet_classnames.txt").write_text("n001,thing\n")
    asset_dir = tmp_path / "assets"
    asset_dir.mkdir()
    spec = {"url": "https://unreachable.invalid/imagenet_classnames.txt",
            "file": "imagenet_classnames.txt", "convert": None,
            "asset": "imagenet_classnames.txt"}
    msg = fetch_weights.fetch_one(
        "imagenet_classnames", spec, {}, asset_dir=str(asset_dir),
        from_dir=str(tmp_path / "upstream"))
    assert "asset installed" in msg
    assert (asset_dir / "imagenet_classnames.txt").read_text() \
        == "n001,thing\n"


def test_from_dir_prefers_exact_manifest_name(cache, tmp_path):
    # the csp entries share URL basenames with the darknet53 ones; an
    # exact spec["file"] match must beat a URL-basename match
    up = tmp_path / "up"
    up.mkdir()
    (up / "tf_keras_darknet53_448_include_top.h5").write_bytes(b"v3")
    (up / "tf_keras_cspdarknet53_448_include_top.h5").write_bytes(b"v4")
    src = fetch_weights._find_local(
        str(up), "tf_keras_cspdarknet53_448_include_top.h5",
        "https://x/tf_keras_darknet53_448_include_top.h5")
    assert src.endswith("tf_keras_cspdarknet53_448_include_top.h5")
    # fallback to the URL basename when the exact name is absent
    src = fetch_weights._find_local(
        str(up), "not_there.h5",
        "https://x/tf_keras_darknet53_448_include_top.h5")
    assert src.endswith("tf_keras_darknet53_448_include_top.h5")


def test_force_offline_falls_back_to_cached_copy(cache, tmp_path):
    spec = {"url": "https://unreachable.invalid/f.bin",
            "file": "f.bin", "convert": None}
    dest = cache / "f.bin"
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_bytes(b"cached-bytes")
    lock = {}
    msg = fetch_weights.fetch_one("f", spec, lock, force=True)
    # refetch failed but the intact cached artifact is still processed
    assert "raw artifact cached" in msg
    assert len(lock["f"]["sha256"]) == 64
