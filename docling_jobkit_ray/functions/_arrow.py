"""Arrow helpers shared by the vector kernels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_to_matrix(col: pa.ChunkedArray | pa.Array, dtype=np.float32) -> np.ndarray:
    """Zero-ish-copy conversion of a fixed-width list<float> column to a 2D
    numpy matrix: flatten the Arrow child buffer and reshape — avoids the
    per-row ``to_pylist()`` materialization (10-50x faster on wide columns)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.flatten().to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    n = len(col)
    if n == 0:
        return values.reshape(0, 0)
    dim = len(values) // n
    return values.reshape(n, dim)
