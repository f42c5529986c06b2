"""Tests for the vendored pure-Python LMDB parser.

No lmdb wheel or liblmdb exists here, so the fixture is built by hand to
the v1 on-disk format (64-bit struct layout): two meta pages, a branch
root over two leaf pages, inline values, and one BIGDATA value spanning
two overflow pages. This exercises every code path the LSUN ingestion
uses (meta selection by txnid, branch descent, leaf decode, overflow
reassembly).
"""

import io
import json
import os
import struct
import zipfile

import numpy as np
import pytest

from next3d_tpu.data.lmdb_reader import LMDBReader, LMDBFormatError

PSIZE = 4096
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
HDR = 16


def _page_header(pgno, flags, nkeys=0, upper=PSIZE, pb_pages=None):
    lower = HDR + 2 * nkeys
    if pb_pages is not None:  # overflow pages store a page count instead
        return struct.pack('<QHHI', pgno, 0, flags, pb_pages)
    return struct.pack('<QHHHH', pgno, 0, flags, lower, upper)


def _db_record(pad=0, flags=0, depth=0, entries=0, root=-1):
    return struct.pack('<IHHQQQQq', pad, flags, depth, 0, 0, 0, entries, root)


def _meta_page(pgno, txnid, psize, main_root, main_depth, main_entries,
               last_pg):
    page = bytearray(psize)
    page[:HDR] = _page_header(pgno, P_META)
    body = struct.pack('<II', 0xBEEFC0DE, 1)
    body += struct.pack('<QQ', 0, psize * (last_pg + 1))  # address, mapsize
    body += _db_record(pad=psize)                          # free DB
    body += _db_record(flags=0, depth=main_depth, entries=main_entries,
                       root=main_root)                     # main DB
    body += struct.pack('<Qq', last_pg, txnid)
    page[HDR:HDR + len(body)] = body
    return bytes(page)


def _leaf_page(pgno, nodes):
    """nodes: list of (key, value_bytes_or_('big', ovpgno, dsize))."""
    page = bytearray(PSIZE)
    ptrs, upper = [], PSIZE
    blobs = []
    for key, val in nodes:
        if isinstance(val, tuple):
            _, ovpg, dsize = val
            node = struct.pack('<HHHH', dsize & 0xFFFF, dsize >> 16,
                               F_BIGDATA, len(key)) + key
            node += struct.pack('<Q', ovpg)
        else:
            dsize = len(val)
            node = struct.pack('<HHHH', dsize & 0xFFFF, dsize >> 16,
                               0, len(key)) + key + val
        blobs.append(node)
    for node in reversed(blobs):
        upper -= len(node)
        upper -= upper % 2  # nodes are 2-byte aligned
        page[upper:upper + len(node)] = node
        ptrs.append(upper)
    ptrs = list(reversed(ptrs))
    page[:HDR] = _page_header(pgno, P_LEAF, nkeys=len(nodes), upper=upper)
    for i, p in enumerate(ptrs):
        page[HDR + 2 * i:HDR + 2 * i + 2] = struct.pack('<H', p)
    return bytes(page)


def _branch_page(pgno, children):
    """children: list of (key, child_pgno); first key is empty."""
    page = bytearray(PSIZE)
    ptrs, upper = [], PSIZE
    blobs = []
    for key, child in children:
        lo, hi, fl = child & 0xFFFF, (child >> 16) & 0xFFFF, child >> 32
        blobs.append(struct.pack('<HHHH', lo, hi, fl, len(key)) + key)
    for node in reversed(blobs):
        upper -= len(node)
        upper -= upper % 2
        page[upper:upper + len(node)] = node
        ptrs.append(upper)
    ptrs = list(reversed(ptrs))
    page[:HDR] = _page_header(pgno, P_BRANCH, nkeys=len(children), upper=upper)
    for i, p in enumerate(ptrs):
        page[HDR + 2 * i:HDR + 2 * i + 2] = struct.pack('<H', p)
    return bytes(page)


def _overflow_pages(pgno, data, npages):
    buf = bytearray(npages * PSIZE)
    buf[:HDR] = _page_header(pgno, P_OVERFLOW, pb_pages=npages)
    buf[HDR:HDR + len(data)] = data
    return bytes(buf)


BIG_VALUE = bytes(np.random.RandomState(7).randint(0, 256, 6000,
                                                   dtype=np.uint8))


def build_env(dirpath, values=None):
    """data.mdb: meta0(stale), meta1(live), branch root -> 2 leaves,
    one 2-page overflow value."""
    os.makedirs(dirpath, exist_ok=True)
    if values is None:
        values = {b'a-key': b'alpha', b'b-key': b'beta' * 10,
                  b'c-big': ('big',), b'd-key': b'delta'}
    leaf1 = _leaf_page(3, [(b'a-key', values[b'a-key']),
                           (b'b-key', values[b'b-key'])])
    leaf2 = _leaf_page(4, [(b'c-big', ('big', 5, len(BIG_VALUE))),
                           (b'd-key', values[b'd-key'])])
    root = _branch_page(2, [(b'', 3), (b'c-big', 4)])
    ovfl = _overflow_pages(5, BIG_VALUE, 2)
    meta0 = _meta_page(0, txnid=1, psize=PSIZE, main_root=-1, main_depth=0,
                       main_entries=0, last_pg=1)
    meta1 = _meta_page(1, txnid=2, psize=PSIZE, main_root=2, main_depth=2,
                       main_entries=4, last_pg=6)
    with open(os.path.join(dirpath, 'data.mdb'), 'wb') as f:
        f.write(meta0 + meta1 + root + leaf1 + leaf2 + ovfl)


def test_reader_walks_tree_and_overflow(tmp_path):
    env = tmp_path / 'lsun_lmdb'
    build_env(str(env))
    with LMDBReader(str(env)) as r:
        assert len(r) == 4
        items = list(r.items())
    assert [k for k, _ in items] == [b'a-key', b'b-key', b'c-big', b'd-key']
    d = dict(items)
    assert d[b'a-key'] == b'alpha'
    assert d[b'b-key'] == b'beta' * 10
    assert d[b'd-key'] == b'delta'
    assert d[b'c-big'] == BIG_VALUE  # spans two overflow pages


def test_reader_raises_on_truncated_overflow(tmp_path):
    # chop the final overflow page off: the multi-page value can no longer
    # be fully materialized and must raise, not silently return short bytes
    env = tmp_path / 'trunc'
    build_env(str(env))
    p = os.path.join(str(env), 'data.mdb')
    size = os.path.getsize(p)
    with open(p, 'r+b') as f:
        f.truncate(size - PSIZE)
    with LMDBReader(str(env)) as r:
        with pytest.raises(LMDBFormatError, match='truncated'):
            list(r.items())


def test_reader_picks_newest_meta(tmp_path):
    # meta0 claims an empty DB at txn 1; meta1 (txn 2) holds the real tree.
    env = tmp_path / 'e'
    build_env(str(env))
    with LMDBReader(str(env / 'data.mdb')) as r:  # file path works too
        assert len(list(r.items())) == 4


def test_reader_rejects_garbage(tmp_path):
    p = tmp_path / 'data.mdb'
    p.write_bytes(b'\x00' * 8192)
    with pytest.raises(LMDBFormatError):
        LMDBReader(str(p))


def test_dataset_tool_ingests_lmdb(tmp_path):
    from PIL import Image

    from next3d_tpu.cli.dataset_tool import convert_dataset

    # values are encoded images, as in LSUN
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (12, 16, 3), dtype=np.uint8)
            for _ in range(3)]
    vals = {}
    for i, a in enumerate(imgs):
        buf = io.BytesIO()
        Image.fromarray(a).save(buf, format='PNG')
        vals[f'{i}-key'.encode()] = buf.getvalue()
    vals[b'z-junk'] = b'not an image'  # must be skipped, not fatal

    env = tmp_path / 'lsun'
    keys = sorted(vals)
    leaf = _leaf_page(2, [(k, vals[k]) for k in keys])
    meta0 = _meta_page(0, txnid=1, psize=PSIZE, main_root=-1, main_depth=0,
                       main_entries=0, last_pg=1)
    meta1 = _meta_page(1, txnid=2, psize=PSIZE, main_root=2, main_depth=1,
                       main_entries=len(vals), last_pg=2)
    os.makedirs(env)
    (env / 'data.mdb').write_bytes(meta0 + meta1 + leaf)

    dest = tmp_path / 'out.zip'
    convert_dataset(str(env), str(dest), resolution=8,
                    transform='center-crop')
    with zipfile.ZipFile(dest) as zf:
        names = [n for n in zf.namelist() if n.endswith('.png')]
        assert len(names) == 3
        arr = np.array(Image.open(io.BytesIO(zf.read(names[0]))))
        assert arr.shape == (8, 8, 3)
        meta = json.loads(zf.read('dataset.json'))
        assert meta == {'labels': []}
