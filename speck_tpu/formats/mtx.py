"""MatrixMarket (.mtx) coordinate-file parser.

Behavioral parity with loadMTX (/root/reference/source/COO.cpp:52-164):
  - only ``matrix coordinate`` files are accepted;
  - field: real/integer/double accepted for float dtypes; ``pattern`` fills
    values with 1; ``complex`` reads the real part (the reference streams one
    value and ignores the rest of the line);
  - symmetry: general, symmetric, or Hermitian; symmetric/Hermitian entries
    off the diagonal are mirrored (duplicated transposed);
  - indices are 1-based in the file, converted to 0-based;
  - duplicate entries are kept (no deduplication);
  - out-of-range indices raise.

A fast native (C++) tokenizer is used when available (speck_tpu.native),
falling back to a vectorized numpy parser.
"""

from __future__ import annotations

import numpy as np

from .csr import HostCOO

_REAL_FIELDS = {"real", "integer", "double"}


def _parse_header(line: str):
    if not line.startswith("%%MatrixMarket matrix coordinate"):
        raise ValueError(
            "Can only read MatrixMarket format that is in coordinate form"
        )
    tokens = line.split()
    field = tokens[3].lower()
    symmetry = tokens[4].lower() if len(tokens) > 4 else "general"
    if field not in _REAL_FIELDS and field not in ("pattern", "complex"):
        raise ValueError("MatrixMarket data type does not match matrix format")
    if symmetry not in ("general", "symmetric", "hermitian"):
        raise ValueError(
            "Can only read MatrixMarket format that is either symmetric,"
            " general or hermitian"
        )
    return field, symmetry


def load_mtx(path: str, dtype=np.float64, use_native: bool = True) -> HostCOO:
    """Parse a .mtx file into a HostCOO (duplicates kept, symmetry expanded)."""
    if use_native:
        try:
            from ..native import mtx_parse_native

            out = mtx_parse_native(path, dtype)
            if out is not None:
                return out
        except Exception:
            pass  # fall back to the pure-python parser
    with open(path, "r") as fh:
        header = fh.readline()
        field, symmetry = _parse_header(header)
        # size line: first non-comment, non-empty line
        while True:
            line = fh.readline()
            if not line:
                raise ValueError(f"Failed to read matrix market header from {path!r}")
            s = line.strip()
            if not s or s.startswith("%"):
                continue
            parts = s.split()
            num_rows, num_cols, num_nnz = int(parts[0]), int(parts[1]), int(parts[2])
            break
        body = fh.read()

    # Vectorized tokenization of the body. Entry lines have a fixed column
    # count per file (2 for pattern, 3 for real, 4 for complex); comment
    # lines (%) may appear between entries and are stripped first.
    lines = body.split("\n")
    rows_l = [ln for ln in lines if ln and not ln.lstrip().startswith("%") and ln.strip()]
    if len(rows_l) < num_nnz:
        raise ValueError(f"Failed to read data from matrix market file {path!r}")
    text = "\n".join(rows_l[:num_nnz])
    if field == "pattern":
        tok = np.array(text.split(), dtype=np.float64)
        if tok.size != 2 * num_nnz:
            raise ValueError(
                f"Failed to read data from matrix market file {path!r}"
            )
        tok = tok.reshape(num_nnz, 2)
        r = tok[:, 0].astype(np.int64)
        c = tok[:, 1].astype(np.int64)
        d = np.ones(num_nnz, dtype=dtype)
    else:
        ncol = 4 if field == "complex" else 3
        tok = np.array(text.split(), dtype=np.float64)
        if tok.size != ncol * num_nnz:
            raise ValueError(
                f"Failed to read data from matrix market file {path!r}"
            )
        tok = tok.reshape(num_nnz, ncol)
        r = tok[:, 0].astype(np.int64)
        c = tok[:, 1].astype(np.int64)
        d = tok[:, 2].astype(dtype)

    if (r < 1).any() or (r > num_rows).any():
        raise ValueError(f"Row index out of bounds in matrix market file {path!r}")
    if (c < 1).any() or (c > num_cols).any():
        raise ValueError(f"Column index out of bounds in matrix market file {path!r}")
    r -= 1
    c -= 1

    if symmetry in ("symmetric", "hermitian"):
        # mirror off-diagonal entries: (r,c,d) -> additionally (c,r,d)
        # (COO.cpp:148-159; duplicates kept, diagonal not duplicated)
        off = r != c
        r, c, d = (
            np.concatenate([r, c[off]]),
            np.concatenate([c, r[off]]),
            np.concatenate([d, d[off]]),
        )

    return HostCOO(
        rows=num_rows,
        cols=num_cols,
        row_ids=r.astype(np.uint32),
        col_ids=c.astype(np.uint32),
        data=d,
    )


def store_mtx(path: str, coo: HostCOO, field: str = "real") -> None:
    """Write a HostCOO as a general MatrixMarket coordinate file (1-based).

    The body is formatted by the native C++ writer when available
    (%.17g round-trips float64 exactly); numpy fallback otherwise — a
    per-nonzero python write loop is unusable at 1e8 nnz."""
    from ..native import mtx_write_native

    with open(path, "wb") as fh:
        fh.write(
            f"%%MatrixMarket matrix coordinate {field} general\n".encode())
        fh.write(f"{coo.rows} {coo.cols} {coo.nnz}\n".encode())
        if mtx_write_native(fh, coo.row_ids, coo.col_ids,
                            np.asarray(coo.data, np.float64), field):
            pass
        elif field == "pattern":
            np.savetxt(
                fh,
                np.stack([coo.row_ids + 1, coo.col_ids + 1], axis=1),
                fmt="%d %d",
            )
        else:
            rec = np.rec.fromarrays([
                coo.row_ids.astype(np.int64) + 1,
                coo.col_ids.astype(np.int64) + 1,
                np.asarray(coo.data, np.float64),
            ])
            np.savetxt(fh, rec, fmt="%d %d %.17g")
