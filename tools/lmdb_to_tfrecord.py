"""Convert a reference BasicSR-style ``*.lmdb`` image archive to the
TPU-native packed TFRecord format (data/packed.py).

Reference datasets ship as lmdb folders (reference utils/file_client.py
:93-130, data/utils_data.py:94-160); the TFRecord archive is the
random-access format the training pipeline prefers (sequential reads,
os.pread-safe concurrency, any-TFRecord-tooling compatible).  Reads go
through the pure-Python LMDB parser, so no lmdb package is needed.

    python tools/lmdb_to_tfrecord.py <src.lmdb> <out_prefix>

Keys keep their original filename (meta_info.txt extension restored) so
the packed archive pairs by the same basenames as the disk layout.
"""

import json
import sys


def convert(src_lmdb: str, out_prefix: str) -> int:
    from textualdegremoval_tpu.data.lmdb_reader import LmdbKeyedReader
    from textualdegremoval_tpu.data.packed import (
        TFRecordWriter, _encode_payload)

    reader = LmdbKeyedReader(src_lmdb)
    index = {}
    with TFRecordWriter(out_prefix + ".tfrecord") as w:
        for key in reader.keys():
            name = reader.filename(key)
            off, _ = w.write(_encode_payload(name, reader.get(key)))
            index[name] = off
    with open(out_prefix + ".index.json", "w") as f:
        json.dump(index, f)
    return len(index)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    n = convert(sys.argv[1], sys.argv[2])
    print(f"packed {n} records -> {sys.argv[2]}.tfrecord")
