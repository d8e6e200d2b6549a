"""Focused tests for the zero-copy Arrow bridges (ADVICE r11 #1-#3):
the ragged-row guard, the fallback dtype inference, and the mat_list
offset-overflow assertion."""

import numpy as np
import pyarrow as pa
import pytest

from spark_ml_pipelines_example_spark.operators._arrow import list_mat, mat_list


def test_list_mat_zero_copy_path_exact():
    m = list_mat(pa.array([[1, 2], [3, 4], [5, 6]]), 2)
    assert m.tolist() == [[1, 2], [3, 4], [5, 6]]
    assert m.dtype == np.int64


def test_list_mat_rejects_compensating_ragged_rows():
    """ADVICE r11 #1: rows of widths 3 and 1 with dim=2 must NOT be
    silently reshaped into [[1,2],[3,4]] — the per-row width check sends
    them to the exact fallback, which refuses to form a matrix."""
    ragged = pa.array([[1, 2, 3], [4]])
    with pytest.raises(ValueError):
        list_mat(ragged, 2)


def test_list_mat_sliced_array_respects_offsets():
    arr = pa.array([[9, 9], [1, 2], [3, 4]]).slice(1)
    assert list_mat(arr, 2).tolist() == [[1, 2], [3, 4]]


def test_list_mat_fixed_size_list():
    arr = pa.FixedSizeListArray.from_arrays(pa.array([1, 2, 3, 4]), 2)
    assert list_mat(arr, 2).tolist() == [[1, 2], [3, 4]]


def test_list_mat_fallback_infers_float_dtype():
    """ADVICE r11 #2: a float list hitting the fallback (inner null in
    one row) must not be truncated to int64 — dtype comes from the Arrow
    value type. Build a null-free float case via the width mismatch
    fallback path instead (all rows width 3, dim asked 3 but with an
    inner null forcing the per-row build)."""
    arr = pa.array([[1.5, 2.5], [3.5, None]])
    # inner null -> flat.null_count > 0 -> fallback; None makes np.array
    # produce nan under float dtype rather than garbage int64
    m = list_mat(arr, 2)
    assert m.dtype == np.float64
    assert m[0].tolist() == [1.5, 2.5]
    assert np.isnan(m[1, 1])


def test_mat_list_roundtrip_and_overflow_guard():
    m = np.arange(6, dtype=np.int64).reshape(3, 2)
    arr = mat_list(m)
    assert arr.to_pylist() == [[0, 1], [2, 3], [4, 5]]
    big = np.lib.stride_tricks.as_strided(
        np.zeros(1, dtype=np.int64), shape=(2**28, 16), strides=(0, 0)
    )
    with pytest.raises(AssertionError):
        mat_list(big)
