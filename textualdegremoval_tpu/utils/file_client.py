"""Byte-stream file backends (reference utils/file_client.py:5-187).

Disk backend always available.  LMDB reads work with or without the lmdb
C package: the pure-Python parser (data/lmdb_reader.py) handles reference
``*.lmdb`` archives read-only on any rig; TFRecord archives
(data/packed.py) are the recommended TPU-native packed format."""

from __future__ import annotations


class DiskBackend:
    def get(self, filepath: str) -> bytes:
        with open(filepath, "rb") as f:
            return f.read()


class LmdbBackend:
    def __init__(self, db_path: str, readonly=True, lock=False,
                 readahead=False):
        try:
            import lmdb
        except ImportError:
            from textualdegremoval_tpu.data.lmdb_reader import PurePythonLmdb

            self._env = None
            self._pure = PurePythonLmdb(db_path)
        else:
            self._env = lmdb.open(db_path, readonly=readonly, lock=lock,
                                  readahead=readahead)

    def get(self, key: str) -> bytes:
        if self._env is None:
            return self._pure.get(key)
        with self._env.begin(write=False) as txn:
            return bytes(txn.get(key.encode("ascii")))


class MemcachedBackend:
    """Cluster memcached reads (reference utils/file_client.py:26-58).
    Gated on the proprietary ``mc`` client the reference also requires."""

    def __init__(self, server_list_cfg: str, client_cfg: str,
                 sys_path: str | None = None):
        if sys_path is not None:
            import sys

            sys.path.append(sys_path)
        try:
            import mc
        except ImportError as e:
            raise ImportError(
                "memcached backend requested but the mc client is not "
                "installed") from e
        self._mc = mc
        self._client = mc.MemcachedClient.GetInstance(server_list_cfg,
                                                      client_cfg)
        self._buffer = mc.pyvector()

    def get(self, filepath: str) -> bytes:
        self._client.Get(str(filepath), self._buffer)
        return self._mc.ConvertBuffer(self._buffer)


class TfrecordBackend:
    """Keyed reads from a packed TFRecord archive (data/packed.py) — the
    TPU-native replacement for the reference's LMDB backend."""

    def __init__(self, db_path: str, verify: bool = False):
        from textualdegremoval_tpu.data.packed import PackedImageReader

        self._reader = PackedImageReader(db_path, verify=verify)

    def get(self, key: str) -> bytes:
        return self._reader.get(key)


class FileClient:
    _backends = {"disk": DiskBackend, "lmdb": LmdbBackend,
                 "memcached": MemcachedBackend, "tfrecord": TfrecordBackend}

    def __init__(self, backend: str = "disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"backend {backend} not supported; choose from "
                f"{sorted(self._backends)}")
        self.backend = self._backends[backend](**kwargs)

    def get(self, filepath: str) -> bytes:
        return self.backend.get(filepath)
