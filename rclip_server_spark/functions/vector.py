"""Vector algebra as pure-SQL column expressions.

These are the oracle-checkable twins of the reference's NumPy operations
(rclip_server.py:141/180/187 normalize, :196 dot-product scoring, :267-268
min-max scaling). They stay entirely JVM-side — higher-order array functions,
no Python in the loop — so Catalyst keeps whole-stage codegen around them.
The BLAS-speed scoring path lives in operators/similarity.py (Arrow GEMV);
these expressions are the semantics-defining reference implementation.

All arithmetic is done in DOUBLE regardless of the (float32) storage type so
that results are bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def vec_lit(values: Sequence[float]) -> Column:
    """A literal vector as array<double>."""
    return F.array(*[F.lit(float(v)) for v in values])


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product of two array columns, accumulated left-to-right in double.

    Mirrors the reference's GEMV row semantics (rclip_server.py:196): on
    unit-norm inputs this IS cosine similarity.
    """
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: ColumnOrName) -> Column:
    sq = F.aggregate(
        _col(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def l2_normalize(a: ColumnOrName) -> Column:
    """x / ||x||2, the invariant the reference maintains at index time
    (index_wikimedia.py:148-150) and query time (rclip_server.py:141)."""
    a = _col(a)
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def scale(a: ColumnOrName, s) -> Column:
    """a * scalar (signed weighted term scaling, rclip_server.py:136)."""
    s = F.lit(float(s)) if not isinstance(s, Column) else s
    return F.transform(_col(a), lambda x: x.cast("double") * s)


def vadd(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") + y.cast("double"))


def vsub(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") - y.cast("double"))


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity for NOT-pre-normalized inputs."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def minmax_scale(a: ColumnOrName, mins: ColumnOrName, ranges: ColumnOrName) -> Column:
    """(x - min) / range, element-wise over three parallel arrays
    (rclip_server.py:267-268, the visualization normalizer)."""
    shifted = F.zip_with(_col(a), _col(mins), lambda x, m: x.cast("double") - m.cast("double"))
    return F.zip_with(shifted, _col(ranges), lambda x, r: x / r.cast("double"))


def quantize_int8(a: ColumnOrName, scale: float = 127.0) -> Column:
    """Symmetric int8 quantization: round(x * scale) per element.

    Unit-norm components lie in [-1, 1], so scale 127 fits int8 exactly —
    a 4x storage cut (512 floats → 512 bytes) that matters at 100 TB. Kept
    as array<int> at rest here for parquet/oracle portability; round() is
    half-away-from-zero in both engines, so the quantized values (and any
    score computed from them) are bit-identical cross-engine."""
    s = F.lit(float(scale))
    return F.transform(_col(a), lambda x: F.round(x.cast("double") * s).cast("int"))


def dequantize_int8(q: ColumnOrName, scale: float = 127.0) -> Column:
    """Inverse of quantize_int8 (max abs error 1/(2*scale) per component)."""
    s = F.lit(float(scale))
    return F.transform(_col(q), lambda x: x.cast("double") / s)


def binarize_words(a: ColumnOrName, dim: int, word_bits: int = 32) -> Column:
    """Binary (sign-bit) quantization: pack the embedding's signs into
    ceil(dim/word_bits) BIGINT words — bit i of word w is 1 iff
    a[w*word_bits + i] >= 0. At dim 64 that is 8 bytes per vector vs 256
    for float32: a 32x storage/IO cut, the coarsest tier of the
    quantization ladder (float32 -> int8 -> binary). 32-bit words keep the
    packed value well inside int64 (no sign-bit ambiguity, ANSI-safe).

    DuckDB twin: the same CASE-sum per word (see contract.binary_words_sql).
    """
    c = _col(a)
    words = []
    for w in range(0, dim, word_bits):
        bits = [
            F.when(
                F.element_at(c, w + i + 1) >= 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            for i in range(min(word_bits, dim - w))
        ]
        acc = bits[0]
        for b in bits[1:]:
            acc = acc + b
        words.append(acc)
    return F.array(*words)


def hamming_packed(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Hamming distance between two packed sign-bit arrays: popcount of the
    per-word XOR, summed — pure JVM bit math, no UDF."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, h: acc + h.cast("long"),
    )
