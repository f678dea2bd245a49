"""Minimal Erdas Imagine (HFA / .img) raster reader.

Implements the subset of the HFA format needed to read single-band DEM
rasters like the reference's bundled Newcastle model
(test/newcastle-centre/topography/NewcastleCentreDEM_2m.img): the
Ehfa_HeaderTag/Ehfa_File header, the Ehfa_Entry tree, Eimg_Layer geometry,
Edms_State block tables with both uncompressed and ESRI RLC-compressed
blocks, and Eprj_MapInfo georeferencing.  Written from scratch against the
published container layout; the reference reads these files through GDAL
(src/Datasets/CRasterDataset.cpp:73-96).

Format notes (validated against real files):
  * all header/entry/table scalars little-endian;
  * entry tree: next/prev/parent/child/data pointers + name[64]/type[32];
  * Eimg_Layer: width, height, layerType(e16), pixelType(e16), blockWidth,
    blockHeight;
  * Edms_State: block table of (fileCode s16, offset i32, size i32,
    logvalid e16, compression e16);
  * RLC block: 13-byte header {min u32 LE, numRuns i32 LE, dataOffset i32
    LE, numBits u8}, then run counts (big-endian varints, 2-bit length tag
    in the top bits), then run values (big-endian, numBits each); pixel =
    min + value as integer arithmetic, reinterpreted for float types;
  * MapInfo coordinates are cell centres.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from .raster import Raster

_PIXEL_TYPES = {
    3: np.dtype("u1"), 4: np.dtype("i1"),
    5: np.dtype("<u2"), 6: np.dtype("<i2"),
    7: np.dtype("<u4"), 8: np.dtype("<i4"),
    9: np.dtype("<f4"), 10: np.dtype("<f8"),
}


class _Entry:
    __slots__ = ("name", "type", "data", "data_size", "children")

    def __init__(self, name, typ, data, data_size):
        self.name = name
        self.type = typ
        self.data = data
        self.data_size = data_size
        self.children = []

    def find(self, typ=None, name=None):
        """Depth-first search."""
        stack = list(self.children)
        while stack:
            e = stack.pop(0)
            if (typ is None or e.type == typ) and \
               (name is None or e.name == name):
                return e
            stack.extend(e.children)
        return None


def _read_entries(buf, off):
    entries = []
    while off:
        nxt, _prev, _par, child, data, dsize = struct.unpack(
            "<IIIIIi", buf[off:off + 24])
        name = buf[off + 24:off + 88].split(b"\0")[0].decode("latin1")
        typ = buf[off + 88:off + 120].split(b"\0")[0].decode("latin1")
        e = _Entry(name, typ, data, dsize)
        if child:
            e.children = _read_entries(buf, child)
        entries.append(e)
        off = nxt
    return entries


def _decode_rlc(block: bytes, dtype: np.dtype, count: int) -> np.ndarray:
    """ESRI RLC decompression of one block (native codec when available,
    numpy/Python fallback otherwise)."""
    from ..native import decode_rlc_native
    native = decode_rlc_native(block, count)
    if native is not None:
        nbits = block[12]
        return _reinterpret(native.astype(np.uint64), dtype, nbits)[:count]

    dmin, nruns, doff = struct.unpack("<Iii", block[:12])
    nbits = block[12]

    if nruns == -1:
        # No run-length encoding; values bit-packed straight after header.
        raw = _unpack_values(block, 13, nbits, count)
        vals = (dmin + raw).astype(np.uint64)
        return _reinterpret(vals, dtype, nbits)[:count]

    counts = np.zeros(nruns, dtype=np.int64)
    p = 13
    mv = memoryview(block)
    for i in range(nruns):
        b0 = mv[p]
        tag = b0 >> 6
        if tag == 0:
            counts[i] = b0 & 0x3F
            p += 1
        elif tag == 1:
            counts[i] = ((b0 & 0x3F) << 8) | mv[p + 1]
            p += 2
        elif tag == 2:
            counts[i] = ((b0 & 0x3F) << 16) | (mv[p + 1] << 8) | mv[p + 2]
            p += 3
        else:
            counts[i] = (((b0 & 0x3F) << 24) | (mv[p + 1] << 16)
                         | (mv[p + 2] << 8) | mv[p + 3])
            p += 4

    raw = _unpack_values(block, doff, nbits, nruns)
    vals = (dmin + raw).astype(np.uint64)
    out = np.repeat(vals, counts)
    return _reinterpret(out, dtype, nbits)[:count]


def _unpack_values(block, offset, nbits, n):
    if nbits == 32:
        return np.frombuffer(block, dtype=">u4", count=n,
                             offset=offset).astype(np.uint64)
    if nbits == 16:
        return np.frombuffer(block, dtype=">u2", count=n,
                             offset=offset).astype(np.uint64)
    if nbits == 8:
        return np.frombuffer(block, dtype="u1", count=n,
                             offset=offset).astype(np.uint64)
    if nbits in (1, 2, 4):
        per_byte = 8 // nbits
        nbytes = -(-n // per_byte)
        bytes_ = np.frombuffer(block, dtype="u1", count=nbytes, offset=offset)
        shifts = np.arange(per_byte, dtype=np.uint8) * nbits
        mask = (1 << nbits) - 1
        vals = ((bytes_[:, None] >> shifts[None, :]) & mask).reshape(-1)
        return vals[:n].astype(np.uint64)
    if nbits == 0:
        return np.zeros(n, dtype=np.uint64)
    raise ValueError(f"unsupported RLC bit width {nbits}")


def _reinterpret(vals: np.ndarray, dtype: np.dtype, nbits) -> np.ndarray:
    """Integer min+delta result -> target pixel dtype (float types are
    reinterpretations of the raw 32/64-bit patterns)."""
    if dtype == np.dtype("<f4"):
        return vals.astype(np.uint32).view(np.float32)
    if dtype == np.dtype("<f8"):
        return vals.view(np.float64)
    return vals.astype(dtype)


def read_hfa(path) -> Raster:
    buf = Path(path).read_bytes()
    if not buf.startswith(b"EHFA_HEADER_TAG"):
        raise ValueError(f"{path}: not an HFA file")
    (hdr_ptr,) = struct.unpack("<I", buf[16:20])
    _ver, _free, root_ptr, _ehl, _dict_ptr = struct.unpack(
        "<IIIhI", buf[hdr_ptr:hdr_ptr + 18])
    root = _Entry("root", "root", 0, 0)
    root.children = _read_entries(buf, root_ptr)

    layer = root.find(typ="Eimg_Layer")
    if layer is None:
        raise ValueError(f"{path}: no Eimg_Layer")
    width, height, _lt, pixel_type, bw, bh = struct.unpack(
        "<iiHHii", buf[layer.data:layer.data + 20])
    if pixel_type not in _PIXEL_TYPES:
        raise ValueError(f"{path}: unsupported pixel type {pixel_type}")
    dtype = _PIXEL_TYPES[pixel_type]

    dms = layer.find(typ="Edms_State")
    if dms is None:
        raise ValueError(f"{path}: no Edms_State block table "
                         "(external/spill files not supported)")
    o = dms.data
    _nvb, _nopb, _nextobj = struct.unpack("<iii", buf[o:o + 12])
    o += 12
    o += 2  # compressionType enum
    (n_blocks, _ptr) = struct.unpack("<II", buf[o:o + 8])
    o += 8
    blocks = []
    for _ in range(n_blocks):
        _fc, off, size, logvalid, comp = struct.unpack(
            "<hiiHH", buf[o:o + 14])
        o += 14
        blocks.append((off, size, logvalid, comp))

    blocks_x = -(-width // bw)
    data = np.zeros((blocks_x * bw * (-(-height // bh) ), ), dtype=dtype)
    data = np.zeros((-(-height // bh) * bh, blocks_x * bw), dtype=dtype)
    per_block = bw * bh
    for idx, (off, size, logvalid, comp) in enumerate(blocks):
        by, bx = divmod(idx, blocks_x)
        if not logvalid:
            tile = np.zeros(per_block, dtype=dtype)
        elif comp == 0:
            tile = np.frombuffer(buf, dtype=dtype, count=per_block,
                                 offset=off)
        else:
            tile = _decode_rlc(buf[off:off + size], dtype, per_block)
        data[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] = \
            tile.reshape(bh, bw)
    data = np.ascontiguousarray(data[:height, :width])

    # Georeferencing: Eprj_MapInfo {pc proName, *o upperLeftCenter,
    # *o lowerRightCenter, *o pixelSize, pc units} — pointers are 8-byte
    # (count, offset) headers with the payload inline.
    xll = yll = 0.0
    cell = 1.0
    mi = root.find(typ="Eprj_MapInfo")
    if mi is not None:
        p = mi.data
        cnt, _off = struct.unpack("<II", buf[p:p + 8])
        p += 8 + cnt                       # proName chars
        p += 8
        ulx, uly = struct.unpack("<dd", buf[p:p + 16])
        p += 16
        p += 8
        _lrx, lry = struct.unpack("<dd", buf[p:p + 16])
        p += 16
        p += 8
        csx, _csy = struct.unpack("<dd", buf[p:p + 16])
        p += 16
        cell = csx
        # Centres -> lower-left corner of the grid.
        xll = ulx - cell / 2.0
        yll = lry - cell / 2.0

    # Nodata: Eimg_NonInitializedValue {*b valueBD} = 8-byte pointer +
    # BASEDATA {i32 nrows, i32 ncols, i16 datatype, i16 objecttype, data}.
    nodata = None
    niv = root.find(typ="Eimg_NonInitializedValue")
    if niv is not None:
        p = niv.data + 8
        nrows, ncols, dt_code = struct.unpack("<iih", buf[p:p + 10])
        p += 12
        if nrows * ncols >= 1:
            if dt_code == 9:
                nodata = float(np.frombuffer(buf, "<f4", 1, p)[0])
            elif dt_code == 10:
                nodata = float(np.frombuffer(buf, "<f8", 1, p)[0])
    if nodata is None:
        nodata = -9999.0

    return Raster(data=data, xll=xll, yll=yll, cell_size=cell,
                  nodata=nodata)
