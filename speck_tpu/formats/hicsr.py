"""Binary CSR cache, byte-compatible with the reference's .hicsr format.

Format (matching /root/reference/source/CSR.cpp:27-137):

  CSRIOHeader (little-endian, C struct layout, sizeof == 80):
    char   magic[9]  = {'H','i',\\x01,'C','o','m','p','s','d'}
    (7 bytes padding to align the first uint64_t)
    uint64 typesize        -- sizeof(value type): 4 (float) or 8 (double)
    uint64 compresseddir   -- always 0
    uint64 indexsize       -- sizeof(uint32) == 4
    uint64 fixedoffset     -- always 0
    uint64 offsetsize      -- sizeof(uint32) == 4
    uint64 num_rows, num_columns, num_non_zeroes

  State<T> (CSR.cpp:15-25): { T scaling = 1; bool transpose = false; }
    sizeof == 16 for double (8 + 1 + 7 pad), 8 for float (4 + 1 + 3 pad).

  data[nnz] (T), col_ids[nnz] (uint32), row_offsets[rows+1] (uint32)
"""

from __future__ import annotations

import struct

import numpy as np

from .csr import HostCSR

MAGIC = b"Hi\x01Compsd"
_HEADER_FMT = "<9s7x8Q"  # 80 bytes
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)
assert _HEADER_SIZE == 80


def _state_size(dtype) -> int:
    return 16 if np.dtype(dtype).itemsize == 8 else 8


def load_hicsr(path: str, dtype=np.float64) -> HostCSR:
    """Load a .hicsr binary CSR cache file (loadCSR, CSR.cpp:89-120)."""
    with open(path, "rb") as fh:
        raw = fh.read(_HEADER_SIZE)
        if len(raw) != _HEADER_SIZE:
            raise ValueError("Could not read CSR header")
        (magic, typesize, _cdir, indexsize, _foff, offsetsize,
         num_rows, num_cols, num_nnz) = struct.unpack(_HEADER_FMT, raw)
        if magic != MAGIC:
            raise ValueError("File does not appear to be a CSR Matrix")
        if typesize != np.dtype(dtype).itemsize:
            raise ValueError(
                "File does not contain a CSR matrix with matching type"
            )
        if indexsize != 4 or offsetsize != 4:
            raise ValueError("Unsupported index/offset size in .hicsr file")
        fh.read(_state_size(dtype))  # State<T>: scaling/transpose, unused
        data = np.fromfile(fh, dtype=dtype, count=num_nnz)
        col_ids = np.fromfile(fh, dtype=np.uint32, count=num_nnz)
        row_offsets = np.fromfile(fh, dtype=np.uint32, count=num_rows + 1)
        if (
            data.shape[0] != num_nnz
            or col_ids.shape[0] != num_nnz
            or row_offsets.shape[0] != num_rows + 1
        ):
            raise ValueError("Could not read CSR matrix data")
    return HostCSR(
        rows=int(num_rows),
        cols=int(num_cols),
        row_offsets=row_offsets,
        col_ids=col_ids,
        data=data,
    )


def store_hicsr(path: str, mat: HostCSR) -> None:
    """Store a HostCSR as .hicsr (storeCSR, CSR.cpp:123-137)."""
    dtype = mat.data.dtype
    header = struct.pack(
        _HEADER_FMT,
        MAGIC,
        np.dtype(dtype).itemsize,
        0,
        4,
        0,
        4,
        mat.rows,
        mat.cols,
        mat.nnz,
    )
    state = np.zeros(_state_size(dtype), dtype=np.uint8)
    # State.scaling = 1 (T), State.transpose = false
    state[: np.dtype(dtype).itemsize] = np.frombuffer(
        np.asarray(1, dtype=dtype).tobytes(), dtype=np.uint8
    )
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(state.tobytes())
        fh.write(np.ascontiguousarray(mat.data, dtype=dtype).tobytes())
        fh.write(np.ascontiguousarray(mat.col_ids, dtype=np.uint32).tobytes())
        fh.write(
            np.ascontiguousarray(mat.row_offsets, dtype=np.uint32).tobytes()
        )
