"""The ``vector`` type function surface.

Python equivalents of the reference's SQL functions and operators over
dense vectors (upstream ``pgvector:src/vector.c`` / ``sql/vector.sql``):
distances (`<->` `<#>` `<=>` `<+>`), arithmetic (`+ - *`, concat), norms,
``l2_normalize``, ``binary_quantize``, ``subvector``, the ``avg``/
``sum`` aggregates, and the ``'[1,2,3]'`` text I/O (``vector_in`` /
``vector_out`` / halfvec analogues). Batched over leading axes and
jit-safe; input validation mirrors upstream error text (dim mismatch,
NaN/Inf rejection, malformed literals, dim limits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_hnsw.config import MAX_DIM


def _check_same_dim(a, b):
    if a.shape[-1] != b.shape[-1]:
        raise ValueError(
            f"different vector dimensions {a.shape[-1]} and {b.shape[-1]}"
        )


def l2_distance(a, b):
    """``<->`` euclidean distance."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    _check_same_dim(a, b)
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))


def l2_squared_distance(a, b):
    a, b = jnp.asarray(a), jnp.asarray(b)
    _check_same_dim(a, b)
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.sum(d * d, axis=-1)


def inner_product(a, b):
    a, b = jnp.asarray(a), jnp.asarray(b)
    _check_same_dim(a, b)
    return jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32), axis=-1)


def negative_inner_product(a, b):
    """``<#>`` (pgvector returns the negation for index ordering)."""
    return -inner_product(a, b)


def cosine_distance(a, b):
    """``<=>`` = 1 - cos(a, b); NaN for zero vectors like upstream."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    _check_same_dim(a, b)
    af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
    num = jnp.sum(af * bf, axis=-1)
    den = jnp.sqrt(jnp.sum(af * af, axis=-1) * jnp.sum(bf * bf, axis=-1))
    return 1.0 - num / den


def l1_distance(a, b):
    """``<+>`` taxicab distance."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    _check_same_dim(a, b)
    return jnp.sum(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)), axis=-1)


def vector_dims(a) -> int:
    return jnp.asarray(a).shape[-1]


def vector_norm(a):
    a = jnp.asarray(a).astype(jnp.float32)
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def l2_normalize(a, eps: float = 0.0):
    """Upstream returns the zero vector unchanged (norm == 0)."""
    a = jnp.asarray(a).astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
    return jnp.where(n > eps, a / jnp.where(n == 0, 1.0, n), a)


def vector_add(a, b):
    a, b = jnp.asarray(a), jnp.asarray(b)
    _check_same_dim(a, b)
    return a + b


def vector_sub(a, b):
    a, b = jnp.asarray(a), jnp.asarray(b)
    _check_same_dim(a, b)
    return a - b


def vector_mul(a, b):
    a, b = jnp.asarray(a), jnp.asarray(b)
    _check_same_dim(a, b)
    return a * b


def vector_concat(a, b):
    a, b = jnp.asarray(a), jnp.asarray(b)
    out = jnp.concatenate([a, b], axis=-1)
    if out.shape[-1] > MAX_DIM:
        raise ValueError(f"vector cannot have more than {MAX_DIM} dimensions")
    return out


def subvector(a, start: int, count: int):
    """1-based start like SQL ``subvector(v, start, count)``."""
    a = jnp.asarray(a)
    if count < 1:
        raise ValueError("vector must have at least 1 dimension")
    s = start - 1
    if s < 0 or s >= a.shape[-1]:
        raise ValueError("vector must have at least 1 dimension")
    return a[..., s : s + count]


def binary_quantize(a):
    """``binary_quantize``: 1 where component > 0 (returns uint8 0/1;
    see ops.bitops.pack_bits for the packed form)."""
    return (jnp.asarray(a) > 0).astype(jnp.uint8)


def vector_avg(x, axis: int = 0):
    """``avg`` aggregate over a set of vectors."""
    return jnp.mean(jnp.asarray(x).astype(jnp.float32), axis=axis)


def vector_sum(x, axis: int = 0):
    """``sum`` aggregate over a set of vectors."""
    return jnp.sum(jnp.asarray(x).astype(jnp.float32), axis=axis)


# --------------------------------------------------------------- text I/O
# The type-input/output half of the reference's ``vector`` type (upstream
# ``vector_in`` / ``vector_out`` in ``pgvector:src/vector.c``): the
# ``'[1,2,3]'`` literal format with the same validation and error wording.
# ``halfvec`` analogues round through bf16 (the storage dtype here; bf16
# shares f32's exponent range, so unlike fp16 the conversion itself cannot
# overflow to infinity).

import numpy as _np


def vector_in(s: str, dim: int | None = None) -> _np.ndarray:
    """Parse a ``'[1,2,3]'`` vector literal (``vector_in`` analogue).

    ``dim`` plays the role of the typmod: when given, the parsed vector
    must have exactly that many dimensions.
    """
    raw = s
    t = s.strip()
    if not t.startswith("[") or not t.endswith("]"):
        raise ValueError(f'malformed vector literal: "{raw}"')
    inner = t[1:-1].strip()
    if not inner:
        raise ValueError("vector must have at least 1 dimension")
    parts = inner.split(",")
    vals = _np.empty(len(parts), _np.float32)
    for i, p in enumerate(parts):
        p = p.strip()
        if not p:
            raise ValueError(f'malformed vector literal: "{raw}"')
        try:
            v = float(p)
        except ValueError:
            raise ValueError(f'malformed vector literal: "{raw}"') from None
        if _np.isnan(v):
            raise ValueError("NaN not allowed in vector")
        with _np.errstate(over="ignore"):  # f32 overflow -> inf, checked
            if _np.isinf(v) or _np.isinf(_np.float32(v)):
                raise ValueError("infinite value not allowed in vector")
        vals[i] = v
    if len(vals) > MAX_DIM:
        raise ValueError(
            f"vector cannot have more than {MAX_DIM} dimensions"
        )
    if dim is not None and len(vals) != dim:
        raise ValueError(f"expected {dim} dimensions, not {len(vals)}")
    return vals


def _fmt_f32(x) -> str:
    # shortest decimal that round-trips through float32 (upstream uses Ryu
    # float_to_shortest_decimal, so '1.0' prints as '1')
    return _np.format_float_positional(_np.float32(x), unique=True, trim="-")


def vector_out(v) -> str:
    """Format a vector as the ``'[1,2,3]'`` literal (``vector_out``
    analogue; shortest round-trip decimals like upstream's
    float_to_shortest_decimal)."""
    v = _np.asarray(v, _np.float32).reshape(-1)
    return "[" + ",".join(_fmt_f32(x) for x in v) + "]"


def halfvec_in(s: str, dim: int | None = None) -> _np.ndarray:
    """Parse a halfvec literal into the bf16 storage dtype."""
    import ml_dtypes

    v = vector_in(s, dim=dim)
    h = v.astype(ml_dtypes.bfloat16)
    if not _np.isfinite(h.astype(_np.float32)).all():
        raise ValueError("infinite value not allowed in halfvec")
    return h


def halfvec_out(v) -> str:
    v = _np.asarray(v).astype(_np.float32).reshape(-1)
    return "[" + ",".join(_fmt_f32(x) for x in v) + "]"
