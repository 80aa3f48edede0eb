"""Minimal LMDB *writer* implementing the published on-disk format.

Test-only: the image has no lmdb package, so fixtures for
textualdegremoval_tpu.data.lmdb_reader are built from the format spec
(mdb.c page/node layout) independently of the reader implementation —
meta pages, leaf/branch B-tree pages, overflow pages, BasicSR-style
meta_info.txt.  Bulk-load only (sorted keys, one branch level)."""

from __future__ import annotations

import os
import os.path as osp
import struct

PSIZE = 4096
PAGEHDRSZ = 16
P_INVALID = 0xFFFFFFFFFFFFFFFF
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
INLINE_MAX = 1024  # values beyond this go to overflow pages


def _assemble(pgno: int, flags: int, nodes: list[bytes],
              psize: int = PSIZE) -> bytes:
    """Page = 16-byte header, u16 ptr array growing up, node bodies
    growing down from the top (each 2-byte aligned)."""
    blob = bytearray(psize)
    top = psize
    ptrs = []
    for node in nodes:
        top -= len(node) + (len(node) & 1)
        blob[top : top + len(node)] = node
        ptrs.append(top)
    lower = PAGEHDRSZ + 2 * len(nodes)
    assert lower <= top, "page overflow — writer sizing bug"
    struct.pack_into("<QHHHH", blob, 0, pgno, 0, flags, lower, top)
    struct.pack_into(f"<{len(ptrs)}H", blob, PAGEHDRSZ, *ptrs)
    return bytes(blob)


def _leaf_node(key: bytes, dsize: int, flags: int, data: bytes) -> bytes:
    return struct.pack("<HHHH", dsize & 0xFFFF, dsize >> 16, flags,
                       len(key)) + key + data


def _branch_node(key: bytes, child: int) -> bytes:
    return struct.pack("<HHHH", child & 0xFFFF, (child >> 16) & 0xFFFF,
                       (child >> 32) & 0xFFFF, len(key)) + key


def write_lmdb(db_dir: str, kv: dict, psize: int = PSIZE,
               meta_info: bool = True) -> None:
    """Create db_dir/{data.mdb,lock.mdb[,meta_info.txt]} holding kv."""
    os.makedirs(db_dir, exist_ok=True)
    items = sorted(
        (k.encode("ascii") if isinstance(k, str) else k, v)
        for k, v in kv.items())

    pages: dict[int, bytes] = {}
    next_pg = 2
    n_ovf = 0

    # build leaves (and overflow pages) with a node-size budget per leaf
    leaf_nodes: list[list[bytes]] = [[]]
    leaf_first: list[bytes] = []
    budget = psize - PAGEHDRSZ
    used = 0
    pending_ovf: list[list] = [[]]  # per-leaf [(data,), ...] to allocate later
    for key, val in items:
        if len(val) > INLINE_MAX:
            data_area, dflags = b"\0" * 8, F_BIGDATA  # pgno patched below
        else:
            data_area, dflags = val, 0
        node = _leaf_node(key, len(val), dflags, data_area)
        need = len(node) + (len(node) & 1) + 2
        if used + need > budget and leaf_nodes[-1]:
            leaf_nodes.append([])
            pending_ovf.append([])
            used = 0
        if not leaf_nodes[-1]:
            leaf_first.append(key)
        leaf_nodes[-1].append(node)
        pending_ovf[-1].append(val if dflags else None)
        used += need

    # allocate leaf pgnos first, then overflow pages, patching node data
    leaf_pgnos = []
    for _ in leaf_nodes:
        leaf_pgnos.append(next_pg)
        next_pg += 1
    for li, nodes in enumerate(leaf_nodes):
        for ni, val in enumerate(pending_ovf[li]):
            if val is None:
                continue
            npages = (PAGEHDRSZ + len(val) + psize - 1) // psize
            ov_pg = next_pg
            next_pg += npages
            n_ovf += npages
            blob = bytearray(npages * psize)
            struct.pack_into("<QHHI", blob, 0, ov_pg, 0, P_OVERFLOW, npages)
            blob[PAGEHDRSZ : PAGEHDRSZ + len(val)] = val
            for j in range(npages):
                pages[ov_pg + j] = bytes(
                    blob[j * psize : (j + 1) * psize])
            node = bytearray(nodes[ni])
            struct.pack_into("<Q", node, len(node) - 8, ov_pg)
            nodes[ni] = bytes(node)
        pages[leaf_pgnos[li]] = _assemble(leaf_pgnos[li], P_LEAF, nodes,
                                          psize)

    n_branch = 0
    if len(leaf_pgnos) == 1:
        root, depth = leaf_pgnos[0], 1
    else:
        bnodes = [_branch_node(b"" if i == 0 else leaf_first[i], pg)
                  for i, pg in enumerate(leaf_pgnos)]
        root = next_pg
        next_pg += 1
        n_branch = 1
        pages[root] = _assemble(root, P_BRANCH, bnodes, psize)
        depth = 2

    last_pg = next_pg - 1
    meta = struct.Struct("<IIQQ" + "IHHQQQQQ" * 2 + "QQ")

    def meta_page(pgno: int, txnid: int) -> bytes:
        blob = bytearray(psize)
        struct.pack_into("<QHHHH", blob, 0, pgno, 0, P_META, 0, 0)
        meta.pack_into(
            blob, PAGEHDRSZ,
            0xBEEFC0DE, 1, 0, (last_pg + 1) * psize,
            # FREE_DBI (md_pad carries the page size)
            psize, 0, 0, 0, 0, 0, 0, P_INVALID,
            # MAIN_DBI
            0, 0, depth, n_branch, len(leaf_pgnos), n_ovf, len(items), root,
            last_pg, txnid)
        return bytes(blob)

    pages[0] = meta_page(0, 0)
    pages[1] = meta_page(1, 1)

    with open(osp.join(db_dir, "data.mdb"), "wb") as f:
        for pg in range(last_pg + 1):
            f.write(pages.get(pg, b"\0" * psize))
    open(osp.join(db_dir, "lock.mdb"), "wb").close()
    if meta_info:
        with open(osp.join(db_dir, "meta_info.txt"), "w") as f:
            for key, val in items:
                name = key.decode("ascii")
                if "." not in name:
                    name += ".png"
                f.write(f"{name} (64,64,3) 1\n")
