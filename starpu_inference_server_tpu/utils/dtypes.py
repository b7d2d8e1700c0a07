"""Datatype mapping: KServe-v2 wire names <-> numpy/JAX dtypes.

Reference counterpart: src/utils/datatype_utils.hpp:20-172 (scalar-type
<-> "FP32"-style names <-> torch dtypes, element sizes). The reference
defines TYPE_BOOL..TYPE_BF16 in model_config.proto and rejects
TYPE_STRING at runtime (docs/server_guide.md:103); we mirror that by
raising ``UnsupportedDtypeError`` for BYTES.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from .exceptions import InvalidDtypeError, UnsupportedDtypeError

# wire name -> (numpy dtype, element size in bytes)
_WIRE_TO_NUMPY = {
    "BOOL": np.dtype(np.bool_),
    "UINT8": np.dtype(np.uint8),
    "UINT16": np.dtype(np.uint16),
    "UINT32": np.dtype(np.uint32),
    "UINT64": np.dtype(np.uint64),
    "INT8": np.dtype(np.int8),
    "INT16": np.dtype(np.int16),
    "INT32": np.dtype(np.int32),
    "INT64": np.dtype(np.int64),
    "FP16": np.dtype(np.float16),
    "FP32": np.dtype(np.float32),
    "FP64": np.dtype(np.float64),
    "BF16": np.dtype(jnp.bfloat16),  # ml_dtypes-backed numpy dtype
}

_NUMPY_TO_WIRE = {v: k for k, v in _WIRE_TO_NUMPY.items()}

_WIRE_TO_JNP = {
    "BOOL": jnp.bool_,
    "UINT8": jnp.uint8,
    "UINT16": jnp.uint16,
    "UINT32": jnp.uint32,
    "UINT64": jnp.uint64,
    "INT8": jnp.int8,
    "INT16": jnp.int16,
    "INT32": jnp.int32,
    "INT64": jnp.int64,
    "FP16": jnp.float16,
    "FP32": jnp.float32,
    "FP64": jnp.float64,
    "BF16": jnp.bfloat16,
}

ALL_WIRE_DTYPES = tuple(_WIRE_TO_NUMPY)


def canonical_dtype_name(name: str) -> str:
    """Normalize a dtype name ('fp32', 'FP32', 'float32' ...) to wire form."""
    upper = str(name).strip().upper()
    aliases = {
        "FLOAT32": "FP32",
        "FLOAT": "FP32",
        "FLOAT64": "FP64",
        "DOUBLE": "FP64",
        "FLOAT16": "FP16",
        "HALF": "FP16",
        "BFLOAT16": "BF16",
        "INT": "INT32",
        "LONG": "INT64",
        "BYTE": "INT8",
    }
    upper = aliases.get(upper, upper)
    if upper in ("BYTES", "STRING", "TYPE_STRING"):
        raise UnsupportedDtypeError(
            "BYTES/STRING tensors are defined by the protocol but not "
            "supported at runtime"
        )
    if upper.startswith("TYPE_"):
        upper = upper[len("TYPE_"):]
    if upper not in _WIRE_TO_NUMPY:
        raise InvalidDtypeError(f"unknown dtype: {name!r}")
    return upper


def numpy_dtype(name: str) -> np.dtype:
    return _WIRE_TO_NUMPY[canonical_dtype_name(name)]


def jnp_dtype(name: str):
    return _WIRE_TO_JNP[canonical_dtype_name(name)]


def wire_name(dtype: Union[np.dtype, type, str]) -> str:
    """numpy/jax dtype -> wire name."""
    if isinstance(dtype, str):
        return canonical_dtype_name(dtype)
    dt = np.dtype(dtype)
    try:
        return _NUMPY_TO_WIRE[dt]
    except KeyError:
        raise InvalidDtypeError(f"no wire name for dtype {dtype!r}") from None


def element_size(name: str) -> int:
    return int(numpy_dtype(name).itemsize)
