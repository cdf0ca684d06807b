"""Arrow list-column -> numpy matrix without Python-object round-trips.

``np.vstack(col.to_pylist())`` materializes one Python list + one Python
float per element; ``pc.list_flatten`` hands numpy the underlying value
buffer directly (zero-copy for non-null fixed-width values), so the
embedding hot paths decode a (n, dim) matrix at memcpy speed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_column_matrix(col, dtype=np.float64) -> np.ndarray:
    """list<float>[n] Arrow column -> (n, dim) ndarray.

    Requires rectangular rows (every list the same length, no nulls) —
    true for embedding columns by construction; ragged input fails
    loudly in the reshape rather than silently misaligning."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.astype(dtype, copy=False).reshape(n, -1)
