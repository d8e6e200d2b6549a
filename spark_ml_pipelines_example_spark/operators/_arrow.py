"""Zero-copy Arrow ⇄ NumPy bridges for the audited GEMM kernels.

The quantized-vector kernels (Lloyd assignment, IVF soft-assign, cell
pairs, SemDeDup, PQ coding) all start from an Arrow list<int64|float>
column of fixed-width vectors. The original ``mapInPandas`` bodies
rebuilt the matrix with ``np.array(pdf[col].tolist())`` — one Python
object per row plus a per-row copy, which the 100× probe measured as a
dominant cost next to the (BLAS) GEMM itself (guide §4.2: hand whole
batches to vectorized native code; don't loop rows in Python). An Arrow
list array is ONE contiguous values buffer plus offsets, so the (n, dim)
matrix is a reshape of the values buffer — no per-row work at all.

Values are returned as-is (int64 stays int64); callers cast as their
arithmetic requires. Nulls or ragged rows (no fixture produces either)
fall back to the exact per-row build so behavior cannot diverge.
"""

from __future__ import annotations

import numpy as np


def list_mat(arr, dim: int, dtype=None) -> np.ndarray:
    """(n, dim) matrix from a pyarrow List/LargeList/FixedSizeList array
    of fixed-width ``dim`` rows — zero-copy when the buffer layout
    allows, exact per-row fallback otherwise."""
    import pyarrow as pa

    n = len(arr)
    if n == 0:
        return np.empty((0, dim), dtype=dtype or np.int64)
    if arr.null_count == 0:
        # Per-row width check (ADVICE r11 #1): len(flat) == n*dim alone
        # admits compensating raggedness (rows of widths 3 and 1 with
        # dim=2 reshaping silently into wrong rows). FixedSizeList pins
        # the width by type; variable lists verify every row's length.
        if pa.types.is_fixed_size_list(arr.type):
            widths_ok = arr.type.list_size == dim
        else:
            lens = arr.value_lengths().to_numpy(zero_copy_only=False)
            widths_ok = bool((lens == dim).all())
        flat = arr.flatten()  # respects offsets/slicing
        if widths_ok and flat.null_count == 0 and len(flat) == n * dim:
            m = flat.to_numpy(zero_copy_only=False).reshape(n, dim)
            return m if dtype is None else np.ascontiguousarray(m, dtype=dtype)
    # ragged/null fallback: per-row exact build (never hit by fixtures).
    # dtype inferred from the Arrow value type (ADVICE r11 #2): a future
    # float-list caller must not be silently truncated to int64.
    if dtype is None:
        dtype = np.dtype(arr.type.value_type.to_pandas_dtype())
    return np.array(arr.to_pylist(), dtype=dtype)


def mat_list(m: np.ndarray):
    """pyarrow list<int64> array from an (n, dim) int64 matrix — one
    values buffer + an arithmetic offsets vector, no per-row objects."""
    import pyarrow as pa

    n, dim = m.shape
    # int32 list offsets wrap at 2^31 values (ADVICE r11 #3): fail loudly
    # instead of emitting corrupt offsets. (A single Arrow batch this
    # large would exceed Spark's per-batch limits long before this.)
    assert n * dim < 2**31, f"mat_list overflow: {n}x{dim} exceeds int32 offsets"
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array(m.reshape(-1)))


def pdf_mat(series, dtype=None) -> np.ndarray:
    """(n, dim) matrix from a pandas object Series of per-row numpy
    arrays (the applyInPandas column shape) — one ``np.stack`` instead
    of ``np.array(series.tolist())``'s per-element object walk."""
    vals = series.to_numpy()
    if len(vals) == 0:
        return np.empty((0, 0), dtype=dtype or np.int64)
    m = np.stack(vals)
    return m if dtype is None else np.ascontiguousarray(m, dtype=dtype)
