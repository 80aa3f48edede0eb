"""Pure-Python LMDB parser vs a from-spec writer fixture.

The image has no lmdb package, so fixtures are built by
tests/lmdb_spec_writer.py (independent implementation of the published
mdb.c page layout): meta pages, leaf/branch B-tree, overflow pages."""

import os.path as osp

import numpy as np
import cv2
import pytest

from lmdb_spec_writer import write_lmdb


def _small_kv():
    return {f"img_{i:03d}": bytes([i]) * (10 + i) for i in range(8)}


class TestPurePythonLmdb:
    def test_single_leaf_roundtrip(self, tmp_path):
        from textualdegremoval_tpu.data.lmdb_reader import PurePythonLmdb

        kv = _small_kv()
        write_lmdb(str(tmp_path / "a.lmdb"), kv)
        db = PurePythonLmdb(str(tmp_path / "a.lmdb"))
        assert db.depth == 1 and len(db) == len(kv)
        for k, v in kv.items():
            assert db.get(k) == v

    def test_multi_leaf_branch_tree(self, tmp_path):
        from textualdegremoval_tpu.data.lmdb_reader import PurePythonLmdb

        # ~110 bytes per node x 200 keys -> several leaves + a branch root
        kv = {f"k{i:04d}": (f"value-{i}-" * 12).encode() for i in range(200)}
        write_lmdb(str(tmp_path / "b.lmdb"), kv)
        db = PurePythonLmdb(str(tmp_path / "b.lmdb"))
        assert db.depth == 2
        for k, v in kv.items():
            assert db.get(k) == v
        assert db.keys() == sorted(kv)

    def test_overflow_values(self, tmp_path):
        from textualdegremoval_tpu.data.lmdb_reader import PurePythonLmdb

        rng = np.random.default_rng(0)
        kv = {
            "big_a": rng.integers(0, 256, 5000, np.uint8).tobytes(),
            "big_b": rng.integers(0, 256, 13000, np.uint8).tobytes(),
            "small": b"tiny",
        }
        write_lmdb(str(tmp_path / "c.lmdb"), kv)
        db = PurePythonLmdb(str(tmp_path / "c.lmdb"))
        for k, v in kv.items():
            assert db.get(k) == v

    def test_missing_key_and_items_order(self, tmp_path):
        from textualdegremoval_tpu.data.lmdb_reader import PurePythonLmdb

        kv = _small_kv()
        write_lmdb(str(tmp_path / "d.lmdb"), kv)
        db = PurePythonLmdb(str(tmp_path / "d.lmdb"))
        with pytest.raises(KeyError):
            db.get("nope")
        assert "nope" not in db
        items = list(db.items())
        assert [k for k, _ in items] == sorted(kv)
        assert dict(items) == kv

    def test_not_an_lmdb(self, tmp_path):
        from textualdegremoval_tpu.data.lmdb_reader import (
            LmdbFormatError, PurePythonLmdb)

        bad = tmp_path / "bad.mdb"
        bad.write_bytes(b"\0" * 65536 * 2)
        with pytest.raises(LmdbFormatError):
            PurePythonLmdb(str(bad))


class TestKeyedReaderAndFileClient:
    def test_keyed_reader_meta_info(self, tmp_path):
        from textualdegremoval_tpu.data.lmdb_reader import LmdbKeyedReader

        kv = _small_kv()
        write_lmdb(str(tmp_path / "a.lmdb"), kv)
        r = LmdbKeyedReader(str(tmp_path / "a.lmdb"))
        assert r.keys() == sorted(kv)
        assert r.filename("img_000") == "img_000.png"
        assert r.get("img_003") == kv["img_003"]

    def test_file_client_lmdb_without_package(self, tmp_path):
        from textualdegremoval_tpu.utils.file_client import FileClient

        kv = _small_kv()
        write_lmdb(str(tmp_path / "a.lmdb"), kv)
        fc = FileClient("lmdb", db_path=str(tmp_path / "a.lmdb"))
        assert fc.get("img_005") == kv["img_005"]


class TestLmdbPairing:
    def test_paired_and_tri(self, tmp_path):
        from textualdegremoval_tpu.data.pairing import (
            paired_paths_from_lmdb, tri_paths_from_lmdb)

        kv = _small_kv()
        for sub in ("lq.lmdb", "gt.lmdb", "ref.lmdb"):
            write_lmdb(str(tmp_path / sub), kv)
        pairs = paired_paths_from_lmdb(
            (str(tmp_path / "lq.lmdb"), str(tmp_path / "gt.lmdb")),
            ("lq", "gt"))
        assert len(pairs) == len(kv)
        assert pairs[0] == {"lq_path": "img_000", "gt_path": "img_000"}
        tri = tri_paths_from_lmdb(
            tuple(str(tmp_path / s) for s in
                  ("lq.lmdb", "gt.lmdb", "ref.lmdb")),
            ("lq", "gt", "ref"))
        assert tri[3]["ref_path"] == "img_003"

    def test_key_mismatch_raises(self, tmp_path):
        from textualdegremoval_tpu.data.pairing import paired_paths_from_lmdb

        write_lmdb(str(tmp_path / "lq.lmdb"), {"a": b"1"})
        write_lmdb(str(tmp_path / "gt.lmdb"), {"b": b"1"})
        with pytest.raises(ValueError, match="differ"):
            paired_paths_from_lmdb(
                (str(tmp_path / "lq.lmdb"), str(tmp_path / "gt.lmdb")),
                ("lq", "gt"))

    def test_non_lmdb_folder_rejected(self, tmp_path):
        from textualdegremoval_tpu.data.pairing import paired_paths_from_lmdb

        with pytest.raises(ValueError, match="lmdb"):
            paired_paths_from_lmdb((str(tmp_path), str(tmp_path)),
                                   ("lq", "gt"))


def _write_image_lmdbs(tmp_path, n=3, size=40):
    rng = np.random.default_rng(0)
    kvs = {}
    for sub in ("lq", "gt", "ref"):
        kv = {}
        for i in range(n):
            img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            ok, buf = cv2.imencode(".png", img)
            assert ok
            kv[f"im{i}"] = buf.tobytes()
        write_lmdb(str(tmp_path / f"{sub}.lmdb"), kv)
        kvs[sub] = kv
    return kvs


class TestDatasetOverLmdb:
    def test_withref_dataset_reads_lmdb(self, tmp_path):
        from textualdegremoval_tpu.data.datasets import (
            PairedImageWithRefDataset)

        _write_image_lmdbs(tmp_path)
        ds = PairedImageWithRefDataset({
            "lqroot": str(tmp_path / "lq.lmdb"),
            "hqroot": str(tmp_path / "gt.lmdb"),
            "refroot": str(tmp_path / "ref.lmdb"),
            "io_backend": {"type": "lmdb"},
            "gt_size": 16, "phase": "train", "seed": 0,
        })
        assert len(ds) == 3
        s = ds[0]
        assert s["lq"].shape == (16, 16, 3) and s["gt"].shape == (16, 16, 3)
        assert s["ref"].shape == (40, 40, 3)
        assert s["lq"].dtype == np.float32

    def test_lmdb_key_mismatch_loud(self, tmp_path):
        from textualdegremoval_tpu.data.datasets import (
            PairedImageWithRefDataset)

        _write_image_lmdbs(tmp_path)
        write_lmdb(str(tmp_path / "ref.lmdb"), {"other": b"x"})
        with pytest.raises(ValueError, match="disagree"):
            PairedImageWithRefDataset({
                "lqroot": str(tmp_path / "lq.lmdb"),
                "hqroot": str(tmp_path / "gt.lmdb"),
                "refroot": str(tmp_path / "ref.lmdb"),
                "io_backend": {"type": "lmdb"},
            })


class TestLmdbToTfrecord:
    def test_conversion_roundtrip(self, tmp_path):
        import sys
        sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))
        from lmdb_to_tfrecord import convert
        from textualdegremoval_tpu.data.packed import PackedImageReader
        from textualdegremoval_tpu.data.lmdb_reader import LmdbKeyedReader

        kvs = _write_image_lmdbs(tmp_path, n=4)
        n = convert(str(tmp_path / "lq.lmdb"), str(tmp_path / "lq_packed"))
        assert n == 4
        packed = PackedImageReader(str(tmp_path / "lq_packed"), verify=True)
        src = LmdbKeyedReader(str(tmp_path / "lq.lmdb"))
        assert packed.keys() == [f"im{i}.png" for i in range(4)]
        for i in range(4):
            assert packed.get(f"im{i}.png") == src.get(f"im{i}")


def test_memcached_backend_gated():
    """memcached registers in FileClient and fails with a clear message
    when the mc client is absent (reference utils/file_client.py:26-58)."""
    from textualdegremoval_tpu.utils.file_client import FileClient

    with pytest.raises(ImportError, match="mc client"):
        FileClient("memcached", server_list_cfg="s.conf", client_cfg="c.conf")
