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


# ------------------------------------------------- ordering / btree opclass
# Upstream registers a btree operator class over ``vector``
# (``vector_cmp`` + ``< <= = != >= >`` in ``pgvector:sql/vector.sql``,
# backed by ``vector_cmp``/``vector_lt``/... in ``pgvector:src/vector.c``)
# so vectors can be sorted, DISTINCT-ed, and equality-joined. Ordering is
# element-by-element with Postgres float semantics: NaN sorts GREATER
# than every number and equal to itself (float4_cmp), and when one vector
# is a prefix of the other the shorter sorts first.


def _cmp_keys(v: _np.ndarray) -> _np.ndarray:
    """Total-order keys for f32 values with Postgres NaN-is-largest
    semantics: monotone int32 image of the float order."""
    # -0.0 + 0.0 == +0.0: collapse signed zeros first (float4_cmp treats
    # them equal; their bit patterns differ)
    v = _np.asarray(v, _np.float32) + _np.float32(0.0)
    b = _np.ascontiguousarray(v, _np.float32).view(_np.int32)
    # flip negative floats so the int image is monotone; pin NaN to +max
    keys = _np.where(b < 0, _np.int32(-2147483648) - (b + 1), b)
    keys = _np.where(_np.isnan(v), _np.int32(2147483647), keys)
    return keys


def vector_cmp(a, b) -> int:
    """``vector_cmp`` analogue: -1 / 0 / +1 lexicographic comparison."""
    a = _np.asarray(a, _np.float32).reshape(-1)
    b = _np.asarray(b, _np.float32).reshape(-1)
    n = min(len(a), len(b))
    ka, kb = _cmp_keys(a[:n]), _cmp_keys(b[:n])
    neq = _np.nonzero(ka != kb)[0]
    if len(neq):
        i = neq[0]
        return -1 if ka[i] < kb[i] else 1
    if len(a) != len(b):
        return -1 if len(a) < len(b) else 1
    return 0


def vector_lt(a, b) -> bool:
    return vector_cmp(a, b) < 0


def vector_le(a, b) -> bool:
    return vector_cmp(a, b) <= 0


def vector_eq(a, b) -> bool:
    return vector_cmp(a, b) == 0


def vector_ne(a, b) -> bool:
    return vector_cmp(a, b) != 0


def vector_ge(a, b) -> bool:
    return vector_cmp(a, b) >= 0


def vector_gt(a, b) -> bool:
    return vector_cmp(a, b) > 0


def vector_sort_keys(x) -> _np.ndarray:
    """Batched total-order keys [N, d] int32 — ``ORDER BY vec`` /
    ``DISTINCT`` over a vector column via ``np.lexsort`` on the columns
    (the batched form of :func:`vector_cmp`; same NaN/prefix rules for
    equal-dim batches)."""
    x = _np.asarray(x, _np.float32)
    return _cmp_keys(x)


# ----------------------------------------------------------- binary I/O
# The wire-format half of the type (upstream ``vector_recv``/``vector_send``
# in ``pgvector:src/vector.c``): big-endian int16 dim, int16 unused (0),
# then ``dim`` float4s. ``halfvec`` sends float2 (IEEE fp16 on the wire —
# the storage here is bf16, so send converts bf16->fp16 and recv back;
# both share f32's rounding rules through float32).

import struct as _struct


def vector_send(v) -> bytes:
    v = _np.asarray(v, _np.float32).reshape(-1)
    if len(v) > MAX_DIM:
        raise ValueError(f"vector cannot have more than {MAX_DIM} dimensions")
    return _struct.pack(f">hh{len(v)}f", len(v), 0, *(float(x) for x in v))


def vector_recv(data: bytes) -> _np.ndarray:
    if len(data) < 4:
        raise ValueError("invalid binary data for type vector")
    dim, unused = _struct.unpack(">hh", data[:4])
    if not (0 < dim <= MAX_DIM) or unused != 0:
        raise ValueError(f"expected dimension in [1, {MAX_DIM}], got {dim}")
    if len(data) != 4 + 4 * dim:
        raise ValueError("invalid binary data for type vector")
    vals = _np.frombuffer(data, dtype=">f4", offset=4).astype(_np.float32)
    if _np.isnan(vals).any():
        raise ValueError("NaN not allowed in vector")
    if _np.isinf(vals).any():
        raise ValueError("infinite value not allowed in vector")
    return vals


def halfvec_send(v) -> bytes:
    h = _np.asarray(v).astype(_np.float16).reshape(-1)
    return _struct.pack(">hh", len(h), 0) + h.astype(">f2").tobytes()


def halfvec_recv(data: bytes):
    import ml_dtypes

    if len(data) < 4:
        raise ValueError("invalid binary data for type halfvec")
    dim, unused = _struct.unpack(">hh", data[:4])
    if not (0 < dim <= MAX_DIM) or unused != 0:
        raise ValueError(f"expected dimension in [1, {MAX_DIM}], got {dim}")
    if len(data) != 4 + 2 * dim:
        raise ValueError("invalid binary data for type halfvec")
    vals = _np.frombuffer(data, dtype=">f2", offset=4).astype(_np.float16)
    if _np.isnan(vals.astype(_np.float32)).any():
        raise ValueError("NaN not allowed in halfvec")
    if _np.isinf(vals.astype(_np.float32)).any():
        raise ValueError("infinite value not allowed in halfvec")
    return vals.astype(ml_dtypes.bfloat16)
