"""Bit-exact integer GEMM through float64 BLAS.

numpy routes an int64 ``@`` through its naive non-BLAS inner loop —
10-50× slower than dgemm on the same shapes (measured: the 200k×1600
Lloyd assignment pass at the 100× probe corpus spent ~27 s in the int64
kernel; dgemm does the identical product in well under a second). When
every output cell's PARTIAL sums are exactly representable —
``Σ_k |A_ik·B_kj| < 2^53`` — every dgemm intermediate is an integer
float64 can hold exactly, so blocking order and FMA cannot round and
the float64 product equals the int64 product bit-for-bit. The audited
quantized kernels here are all far inside that bound (|xq| < 2^10,
dim 64 → pairwise dots < 2^26; centroid sums |s| ≤ n·2^10 keep n·2^26
exact up to n = 2^27 cluster members).

The bound is checked at RUNTIME from the actual operand magnitudes —
``max|A|·max|B|·inner_dim`` dominates any partial sum — so exactness is
unconditional: inputs outside the provable range simply take the int64
kernel.
"""

from __future__ import annotations

import numpy as np

_F64_EXACT = 1 << 53


def exact_int_gemm(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """``A @ B`` for integer matrices, bit-exact, BLAS-fast when provable.

    ``max|A|·max|B|·K`` bounds every partial sum of one output cell
    (integers, so any subset sum is ≤ the absolute-value sum); under
    2^53 the float64 path is exact regardless of summation order.
    """
    if A.size == 0 or B.size == 0:
        return A @ B
    bound = int(np.abs(A).max()) * int(np.abs(B).max()) * A.shape[-1]
    if bound < _F64_EXACT:
        return (A.astype(np.float64) @ B.astype(np.float64)).astype(np.int64)
    return A @ B
