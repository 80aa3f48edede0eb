"""Packed-dataset ingestion: TFRecord-framed image archives with an index.

The reference's production IO path is LMDB (utils/file_client.py:5-187);
lmdb is a C dependency absent from this image, and the TPU-native
equivalent is a packed sequential format anyway (SURVEY §2.4 row "LMDB
backend").  This module implements:

* standard TFRecord framing (uint64-LE length + masked crc32c, payload,
  masked crc32c) in pure python/numpy — archives are readable by any
  TFRecord tooling;
* payloads of the form  uint16-LE key_len | key utf-8 | image bytes  so an
  archive is self-describing even without the sidecar;
* a JSON offset index sidecar (<prefix>.index.json) for O(1) random access
  by key — the EnlargedSampler's random permutations need random access,
  which raw TFRecord streams do not give;
* `pack_image_folder` to build archives from the reference's folder
  layouts, and `PackedImageReader` for keyed reads.

Wired into FileClient as the 'tfrecord' backend and into the WithRef
datasets via io_backend: {type: tfrecord} (roots then name archive
prefixes instead of folders).
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

# ---------------------------------------------------------------------------
# crc32c (Castagnoli), table-driven; TFRecord's masked variant
# ---------------------------------------------------------------------------

_CRC_TABLE = None


def _crc_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78  # reflected Castagnoli polynomial
        table = np.zeros(256, np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table[i] = c
        _CRC_TABLE = table
    return _CRC_TABLE


def _crc32c_py(data: bytes) -> int:
    table = _crc_table()
    crc = np.uint32(0xFFFFFFFF)
    for b in np.frombuffer(data, np.uint8):
        crc = table[(crc ^ b) & np.uint32(0xFF)] ^ (crc >> np.uint8(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def crc32c(data: bytes) -> int:
    # the python loop is ~1M interpreter iterations per MB; packing real
    # datasets needs the native slice-by-8 path (native/tdr_dataio.cc)
    from textualdegremoval_tpu.data import native as _native

    if _native.crc32c_available():
        return _native.crc32c(data)
    return _crc32c_py(data)


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# record framing
# ---------------------------------------------------------------------------


def _encode_payload(key: str, img_bytes: bytes) -> bytes:
    kb = key.encode("utf-8")
    return struct.pack("<H", len(kb)) + kb + img_bytes


def _decode_payload(payload: bytes) -> tuple[str, bytes]:
    (klen,) = struct.unpack_from("<H", payload, 0)
    key = payload[2 : 2 + klen].decode("utf-8")
    return key, payload[2 + klen :]


class TFRecordWriter:
    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write(self, payload: bytes) -> tuple[int, int]:
        """Appends one record; returns (offset, framed_length)."""
        off = self._f.tell()
        hdr = struct.pack("<Q", len(payload))
        self._f.write(hdr)
        self._f.write(struct.pack("<I", masked_crc32c(hdr)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", masked_crc32c(payload)))
        return off, 8 + 4 + len(payload) + 4

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_record_at(f, offset: int, verify: bool = False) -> bytes:
    f.seek(offset)
    hdr = f.read(8)
    (length,) = struct.unpack("<Q", hdr)
    (hcrc,) = struct.unpack("<I", f.read(4))
    payload = f.read(length)
    (pcrc,) = struct.unpack("<I", f.read(4))
    if verify:
        if masked_crc32c(hdr) != hcrc:
            raise IOError(f"TFRecord header crc mismatch at offset {offset}")
        if masked_crc32c(payload) != pcrc:
            raise IOError(f"TFRecord payload crc mismatch at offset {offset}")
    return payload


def iterate_records(path: str, verify: bool = False):
    """Sequential scan (index-free recovery path)."""
    with open(path, "rb") as f:
        size = os.fstat(f.fileno()).st_size
        off = 0
        while off < size:
            payload = read_record_at(f, off, verify)
            yield off, payload
            off += 8 + 4 + len(payload) + 4


# ---------------------------------------------------------------------------
# image archives
# ---------------------------------------------------------------------------

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def pack_image_folder(src_dir: str, out_prefix: str) -> int:
    """Pack every image under src_dir (recursive) into
    <out_prefix>.tfrecord + <out_prefix>.index.json.  Keys are paths
    relative to src_dir.  Returns the number of records."""
    keys = []
    for root, _, files in os.walk(src_dir):
        for name in sorted(files):
            if name.lower().endswith(IMAGE_EXTS):
                full = os.path.join(root, name)
                keys.append((os.path.relpath(full, src_dir), full))
    keys.sort()
    index = {}
    with TFRecordWriter(out_prefix + ".tfrecord") as w:
        for key, full in keys:
            with open(full, "rb") as f:
                data = f.read()
            off, _ = w.write(_encode_payload(key, data))
            index[key] = off
    with open(out_prefix + ".index.json", "w") as f:
        json.dump(index, f)
    return len(index)


def _pread_exact(fd: int, n: int, offset: int) -> bytes:
    """Positioned read of exactly n bytes (loops over short reads)."""
    chunks = []
    while n > 0:
        b = os.pread(fd, n, offset)
        if not b:
            raise IOError(f"truncated archive: EOF at offset {offset}")
        chunks.append(b)
        offset += len(b)
        n -= len(b)
    return b"".join(chunks) if len(chunks) != 1 else chunks[0]


class PackedImageReader:
    """Keyed random-access reader over a packed archive.

    Reads go through os.pread on a shared raw fd: positioned reads are
    stateless, so one reader instance is safe to call from the DataLoader's
    concurrent worker threads (a buffered seek+read pair is not atomic and
    interleaves under concurrency)."""

    def __init__(self, prefix: str, verify: bool = False):
        if prefix.endswith(".tfrecord"):
            prefix = prefix[: -len(".tfrecord")]
        self._path = prefix + ".tfrecord"
        self._verify = verify
        idx_path = prefix + ".index.json"
        if os.path.exists(idx_path):
            with open(idx_path) as f:
                self._index = json.load(f)
        else:  # recover by scanning (sidecar lost)
            self._index = {}
            for off, payload in iterate_records(self._path, verify):
                key, _ = _decode_payload(payload)
                self._index[key] = off
        self._fd = None  # opened lazily (post-fork safe)

    def keys(self) -> list[str]:
        return sorted(self._index)

    def __len__(self):
        return len(self._index)

    def __contains__(self, key):
        return key in self._index

    def get(self, key: str) -> bytes:
        fd = self._fd
        if fd is None:
            fd = self._fd = os.open(self._path, os.O_RDONLY)
        offset = self._index[key]
        hdr = _pread_exact(fd, 12, offset)
        (length,) = struct.unpack_from("<Q", hdr, 0)
        (hcrc,) = struct.unpack_from("<I", hdr, 8)
        rest = _pread_exact(fd, length + 4, offset + 12)
        payload = rest[:length]
        if self._verify:
            (pcrc,) = struct.unpack_from("<I", rest, length)
            if masked_crc32c(hdr[:8]) != hcrc:
                raise IOError(
                    f"TFRecord header crc mismatch at offset {offset}")
            if masked_crc32c(payload) != pcrc:
                raise IOError(
                    f"TFRecord payload crc mismatch at offset {offset}")
        got_key, data = _decode_payload(payload)
        if got_key != key:
            raise IOError(
                f"index/archive mismatch: wanted {key!r}, found {got_key!r}")
        return data

    def close(self):
        fd, self._fd = self._fd, None
        if fd is not None:
            os.close(fd)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


_READER_CACHE: dict[str, PackedImageReader] = {}


def open_packed(prefix: str) -> PackedImageReader:
    r = _READER_CACHE.get(prefix)
    if r is None:
        r = _READER_CACHE[prefix] = PackedImageReader(prefix)
    return r


def imdecode_f32(data: bytes, bit16: bool = False) -> np.ndarray:
    """Decode encoded image bytes to HWC RGB float32 in [0, 1] (the packed
    counterpart of datasets.imread_f32)."""
    import cv2

    flag = cv2.IMREAD_UNCHANGED if bit16 else cv2.IMREAD_COLOR
    img = cv2.imdecode(np.frombuffer(data, np.uint8), flag)
    if img is None:
        raise IOError("imdecode failed")
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    img = img[:, :, ::-1]  # BGR -> RGB
    maxv = 65535.0 if img.dtype == np.uint16 else 255.0
    return np.ascontiguousarray(img, np.float32) / maxv
