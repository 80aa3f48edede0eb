"""Packed TFRecord ingestion: framing, index recovery, FileClient backend,
and a WithRef dataset reading from archives (VERDICT round-1 item 8 /
reference utils/file_client.py LMDB parity)."""

import os

import numpy as np
import cv2
import pytest

from textualdegremoval_tpu.data.packed import (
    PackedImageReader, TFRecordWriter, crc32c, imdecode_f32,
    iterate_records, masked_crc32c, pack_image_folder, _encode_payload,
)
from textualdegremoval_tpu.data.datasets import PairedImageWithRefDataset
from textualdegremoval_tpu.utils.file_client import FileClient


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed")
    rng = np.random.default_rng(0)
    imgs = {}
    for sub in ("lq", "hq", "ref"):
        os.makedirs(root / sub)
        for i in range(3):
            img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(root / sub / f"img_{i}.png"), img)
            imgs[(sub, f"img_{i}.png")] = img
        n = pack_image_folder(str(root / sub), str(root / f"{sub}_packed"))
        assert n == 3
    return root, imgs


def test_reader_roundtrip_and_decode(archive):
    root, imgs = archive
    r = PackedImageReader(str(root / "lq_packed"))
    assert r.keys() == ["img_0.png", "img_1.png", "img_2.png"]
    data = r.get("img_1.png")
    decoded = imdecode_f32(data)
    want = imgs[("lq", "img_1.png")][:, :, ::-1].astype(np.float32) / 255.0
    np.testing.assert_allclose(decoded, want)


def test_index_recovery_without_sidecar(archive, tmp_path):
    root, _ = archive
    # copy the record file only; reader must rebuild the index by scanning
    src = str(root / "lq_packed.tfrecord")
    dst = str(tmp_path / "copy.tfrecord")
    with open(src, "rb") as f, open(dst, "wb") as g:
        g.write(f.read())
    r = PackedImageReader(str(tmp_path / "copy"), verify=True)
    assert len(r) == 3
    assert r.get("img_2.png")


def test_corruption_detected(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    with TFRecordWriter(path) as w:
        w.write(_encode_payload("k", b"payload-bytes"))
    with open(path, "r+b") as f:
        f.seek(20)
        f.write(b"\xff")
    with pytest.raises(IOError):
        list(iterate_records(path, verify=True))
    # masked crc sanity: mask is invertible-ish, never equal to raw crc
    assert masked_crc32c(b"abc") != crc32c(b"abc")


def test_file_client_backend(archive):
    root, imgs = archive
    fc = FileClient("tfrecord", db_path=str(root / "ref_packed"))
    buf = fc.get("img_0.png")
    assert imdecode_f32(buf).shape == (24, 32, 3)


def test_crc32c_native_matches_python():
    from textualdegremoval_tpu.data import native
    from textualdegremoval_tpu.data.packed import _crc32c_py

    if not native.crc32c_available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for n in (0, 1, 7, 8, 9, 4096, 100001):
        data = rng.integers(0, 256, n, np.uint8).tobytes()
        assert native.crc32c(data) == _crc32c_py(data)


def test_reader_thread_safe(archive):
    """Concurrent get() from many threads must not tear reads (the loader
    calls dataset[i] from num_worker threads; reads are os.pread-based)."""
    import concurrent.futures as cf

    root, _ = archive
    r = PackedImageReader(str(root / "lq_packed"), verify=True)
    expected = {k: r.get(k) for k in r.keys()}

    def hammer(seed):
        rng = np.random.default_rng(seed)
        keys = r.keys()
        for _ in range(200):
            k = keys[rng.integers(len(keys))]
            if r.get(k) != expected[k]:
                return False
        return True

    with cf.ThreadPoolExecutor(8) as ex:
        assert all(ex.map(hammer, range(8)))


def test_packed_key_mismatch_raises(archive, tmp_path):
    """A misbuilt archive (key sets disagree) must fail loudly, not
    silently shrink the dataset."""
    root, _ = archive
    rng = np.random.default_rng(1)
    os.makedirs(tmp_path / "extra")
    img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "extra" / "odd_one.png"), img)
    pack_image_folder(str(tmp_path / "extra"), str(tmp_path / "bad_ref"))
    with pytest.raises(ValueError, match="disagree on keys"):
        PairedImageWithRefDataset(dict(
            lqroot=str(root / "lq_packed"), hqroot=str(root / "hq_packed"),
            refroot=str(tmp_path / "bad_ref"),
            io_backend={"type": "tfrecord"}, phase="train"))


def test_withref_dataset_from_packed(archive):
    root, _ = archive
    common = dict(geometric_augs=True, gt_size=16, seed=3, phase="train")
    packed = PairedImageWithRefDataset(dict(
        lqroot=str(root / "lq_packed"), hqroot=str(root / "hq_packed"),
        refroot=str(root / "ref_packed"),
        io_backend={"type": "tfrecord"}, **common))
    disk = PairedImageWithRefDataset(dict(
        lqroot=str(root / "lq"), hqroot=str(root / "hq"),
        refroot=str(root / "ref"), io_backend={"type": "disk"}, **common))
    assert len(packed) == len(disk) == 3
    a, b = packed[1], disk[1]
    # same seed -> identical crops/augs; packed decode == disk decode
    np.testing.assert_allclose(a["lq"], b["lq"])
    np.testing.assert_allclose(a["gt"], b["gt"])
    np.testing.assert_allclose(a["ref"], b["ref"])
    assert a["lq"].shape == (16, 16, 3)
