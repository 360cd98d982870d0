"""faiss .index file reader/writer in pure Python (no faiss linkage).

RVC voice models ship a faiss IVF-Flat retrieval index of training-set
HuBERT features; the reference reads it with faiss and reconstructs the
full codebook (reference src/vc_infer_pipeline.py:505-507).  This module
parses the faiss serialization format directly:

  IndexIVFFlat  fourcc 'IwFl': index header, nlist/nprobe, a nested
                quantizer index (IndexFlat 'IxF2'/'IxFI'), a DirectMap,
                and ArrayInvertedLists 'ilar' ('full' or 'sprs' layout).
  IndexFlat     fourcc 'IxF2'/'IxFI'/'IxFl': header + raw codes.

The writer emits the same layout so indexes round-trip and new indexes can
be built without faiss installed.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

METRIC_INNER_PRODUCT = 0
METRIC_L2 = 1


def _fourcc(s: bytes) -> int:
    return struct.unpack("<I", s)[0]


FOURCC_IVF_FLAT = _fourcc(b"IwFl")
FOURCC_FLAT_L2 = _fourcc(b"IxF2")
FOURCC_FLAT_IP = _fourcc(b"IxFI")
FOURCC_FLAT = _fourcc(b"IxFl")
FOURCC_ILAR = _fourcc(b"ilar")
FOURCC_FULL = _fourcc(b"full")
FOURCC_SPRS = _fourcc(b"sprs")


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, fmt: str):
        size = struct.calcsize(fmt)
        vals = struct.unpack_from("<" + fmt, self.data, self.pos)
        self.pos += size
        return vals[0] if len(vals) == 1 else vals

    def read_vector(self, dtype) -> np.ndarray:
        count = self.read("q")
        itemsize = np.dtype(dtype).itemsize
        arr = np.frombuffer(self.data, dtype=dtype, count=count, offset=self.pos)
        self.pos += count * itemsize
        return arr.copy()

    def read_bytes(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out


@dataclass
class FaissIndex:
    """Decoded retrieval index.

    vectors are stored id-ordered (the reconstruct_n contract);
    list_assignment maps each id to its IVF list for nprobe-faithful search.
    """

    d: int
    ntotal: int
    metric_type: int
    vectors: np.ndarray  # (ntotal, d) float32, id order
    centroids: Optional[np.ndarray] = None  # (nlist, d) or None for flat
    list_assignment: Optional[np.ndarray] = None  # (ntotal,) int32
    nprobe: int = 1

    @property
    def nlist(self) -> int:
        return 0 if self.centroids is None else self.centroids.shape[0]


def _read_index_header(r: _Reader):
    d = r.read("i")
    ntotal = r.read("q")
    r.read("q")  # dummy
    r.read("q")  # dummy
    is_trained = r.read("?")
    metric_type = r.read("i")
    if metric_type > 1:
        r.read("f")  # metric_arg
    return d, ntotal, is_trained, metric_type


def _read_flat(r: _Reader, metric_type_from_cc: Optional[int]):
    d, ntotal, _tr, metric = _read_index_header(r)
    if metric_type_from_cc is not None:
        metric = metric_type_from_cc
    codes = r.read_vector(np.uint8)
    xb = np.frombuffer(codes.tobytes(), dtype=np.float32).reshape(ntotal, d).copy()
    return FaissIndex(d=d, ntotal=ntotal, metric_type=metric, vectors=xb)


def _read_direct_map(r: _Reader):
    dm_type = r.read("B")
    if dm_type == 1:  # Array
        r.read_vector(np.int64)
    elif dm_type == 2:  # Hashtable
        r.read_vector(np.int64)  # serialized pairs
    return dm_type


def _read_inverted_lists(r: _Reader, d: int):
    h = r.read("I")
    if h != FOURCC_ILAR:
        raise ValueError(f"unsupported InvertedLists fourcc 0x{h:08x}")
    nlist = r.read("q")
    code_size = r.read("q")
    list_type = r.read("I")
    if list_type == FOURCC_FULL:
        sizes = r.read_vector(np.int64)
    elif list_type == FOURCC_SPRS:
        pairs = r.read_vector(np.int64)
        sizes = np.zeros(nlist, np.int64)
        sizes[pairs[0::2]] = pairs[1::2]
    else:
        raise ValueError(f"unsupported list storage 0x{list_type:08x}")
    ids_all, codes_all, list_ids = [], [], []
    for li in range(nlist):
        n = int(sizes[li])
        if n == 0:
            continue
        ids = np.frombuffer(r.read_bytes(8 * n), dtype=np.int64)
        codes = np.frombuffer(r.read_bytes(code_size * n), dtype=np.uint8)
        ids_all.append(ids)
        codes_all.append(codes.reshape(n, code_size))
        list_ids.append(np.full(n, li, np.int32))
    ids = np.concatenate(ids_all) if ids_all else np.zeros(0, np.int64)
    codes = np.concatenate(codes_all) if codes_all else np.zeros((0, code_size), np.uint8)
    lists = np.concatenate(list_ids) if list_ids else np.zeros(0, np.int32)
    return nlist, code_size, ids, codes, lists


def read_faiss_index(path: str) -> FaissIndex:
    with open(path, "rb") as f:
        r = _Reader(f.read())
    h = r.read("I")
    if h in (FOURCC_FLAT_L2, FOURCC_FLAT_IP, FOURCC_FLAT):
        metric = {FOURCC_FLAT_L2: METRIC_L2, FOURCC_FLAT_IP: METRIC_INNER_PRODUCT}.get(h)
        return _read_flat(r, metric)
    if h != FOURCC_IVF_FLAT:
        raise ValueError(f"unsupported index fourcc 0x{h:08x} (expected IwFl/IxF2/IxFI)")

    d, ntotal, _tr, metric = _read_index_header(r)
    nlist = r.read("q")
    nprobe = r.read("q")
    qh = r.read("I")
    qmetric = {FOURCC_FLAT_L2: METRIC_L2, FOURCC_FLAT_IP: METRIC_INNER_PRODUCT}.get(qh)
    if qmetric is None and qh != FOURCC_FLAT:
        raise ValueError(f"unsupported quantizer fourcc 0x{qh:08x}")
    quantizer = _read_flat(r, qmetric)
    _read_direct_map(r)
    nlist2, code_size, ids, codes, lists = _read_inverted_lists(r, d)
    assert nlist2 == nlist and code_size == d * 4, (nlist2, code_size)

    # reconstruct_n(0, ntotal) contract: vectors in id order
    vectors = np.zeros((ntotal, d), np.float32)
    assignment = np.zeros(ntotal, np.int32)
    flat = np.frombuffer(codes.tobytes(), dtype=np.float32).reshape(-1, d)
    vectors[ids] = flat
    assignment[ids] = lists
    return FaissIndex(
        d=d,
        ntotal=ntotal,
        metric_type=metric,
        vectors=vectors,
        centroids=quantizer.vectors,
        list_assignment=assignment,
        nprobe=max(1, int(nprobe)),
    )


# ---------------------------------------------------------------------------
# Writer (round-trip tests + building indexes without faiss)
# ---------------------------------------------------------------------------


def _write_index_header(out: bytearray, d: int, ntotal: int, metric: int):
    out += struct.pack("<i", d)
    out += struct.pack("<q", ntotal)
    out += struct.pack("<q", 1 << 20)
    out += struct.pack("<q", 1 << 20)
    out += struct.pack("<?", True)
    out += struct.pack("<i", metric)


def _write_vector(out: bytearray, arr: np.ndarray):
    out += struct.pack("<q", arr.size)
    out += arr.tobytes()


def write_ivf_flat_index(
    path: str,
    vectors: np.ndarray,
    centroids: np.ndarray,
    assignment: np.ndarray,
    metric: int = METRIC_L2,
    nprobe: int = 1,
) -> None:
    """Serialize an IVF-Flat index in faiss's format."""
    vectors = np.ascontiguousarray(vectors, np.float32)
    centroids = np.ascontiguousarray(centroids, np.float32)
    ntotal, d = vectors.shape
    nlist = centroids.shape[0]
    out = bytearray()
    out += struct.pack("<I", FOURCC_IVF_FLAT)
    _write_index_header(out, d, ntotal, metric)
    out += struct.pack("<q", nlist)
    out += struct.pack("<q", nprobe)
    # quantizer: IndexFlatL2
    out += struct.pack("<I", FOURCC_FLAT_L2 if metric == METRIC_L2 else FOURCC_FLAT_IP)
    _write_index_header(out, d, nlist, metric)
    _write_vector(out, centroids.reshape(-1).view(np.uint8))
    # direct map: NoMap
    out += struct.pack("<B", 0)
    # inverted lists
    out += struct.pack("<I", FOURCC_ILAR)
    out += struct.pack("<q", nlist)
    out += struct.pack("<q", d * 4)
    out += struct.pack("<I", FOURCC_FULL)
    sizes = np.bincount(assignment, minlength=nlist).astype(np.int64)
    _write_vector(out, sizes)
    order = np.argsort(assignment, kind="stable")
    start = 0
    by_list_ids = {}
    for li in range(nlist):
        n = int(sizes[li])
        sel = order[start : start + n]
        start += n
        out += np.asarray(sel, np.int64).tobytes()
        out += vectors[sel].tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))
