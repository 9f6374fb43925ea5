"""Spark-parity MurmurHash3 as generated DuckDB SQL expressions.

Spark's ``hash()`` (Murmur3 x86_32, seed 42 — see urlnorm.murmur3_32 for the
byte-level semantics) is what d3's minhash base hash, d4's simhash lanes and
t7's fingerprint are built on. DuckDB has no murmur3, but the whole algorithm
is integer arithmetic: a ``list_reduce`` fold over the 4-byte little-endian
words (plus Spark's sign-extended individual tail bytes), with the two
overflow-prone multiplies routed through HUGEINT and reduced ``% 2^32``.
That turns the last "not SQL-expressible" dedup primitives into fully
hash-checked oracles.

Byte access is ``unicode(substr(s, i, 1))`` — codepoint == byte for ASCII,
which the documents fixture is at every SF (asserted in tests); the
generators are documented ASCII-only.

Everything here returns SQL TEXT; it is used at import time to build ORACLE
strings, never executed by Spark.
"""

from __future__ import annotations

_M32 = 4294967296  # 2^32
_C1 = 3432918353  # 0xCC9E2D51
_C2 = 461845907  # 0x1B873593


def _mixk1(k: str) -> str:
    """k1 = rotl32(k*C1, 15) * C2  (all mod 2^32)."""
    y = f"((({k})::HUGEINT * {_C1}) % {_M32})::BIGINT"
    rot = f"((({y} << 15) % {_M32}) + ({y} >> 17))"
    return f"((({rot})::HUGEINT * {_C2}) % {_M32})::BIGINT"


def _mixh1(h: str, k1: str) -> str:
    """h1 = rotl32(h ^ k1, 13) * 5 + 0xE6546B64  (mod 2^32)."""
    x = f"xor({h}, {k1})"
    rot = f"((({x} << 13) % {_M32}) + ({x} >> 19))"
    return f"(({rot} * 5 + 3864292196) % {_M32})"


def murmur_fold_sql(s: str, seed: int = 42) -> str:
    """Fold state h1 over the bytes of ASCII string expression ``s``:
    [seed] ++ 4-byte LE words ++ sign-extended tail bytes, each folded with
    mixH1(acc, mixK1(x)) — exactly Spark's hashUnsafeBytes loop. Returns the
    pre-fmix h1 (BIGINT in [0, 2^32))."""
    byte = "unicode(substr({s},({i})::INT,1))"
    word = "+".join(
        f"{1 << (8 * j)}*{byte.format(s=s, i=f'4*w+{j + 1}')}" for j in range(4)
    )
    tail_b = byte.format(s=s, i="i+1")
    return f"""list_reduce(
      [{seed}::BIGINT]
      || list_transform(range(0, length({s})//4), w -> ({word})::BIGINT)
      || list_transform(range((length({s})//4)*4, length({s})),
           i -> (CASE WHEN {tail_b} >= 128 THEN 4294967040 + {tail_b}
                      ELSE {tail_b} END)::BIGINT),
      (h, k) -> {_mixh1("h", _mixk1("k"))})"""


def fmix_aliases(h: str, n: str, out: str, pfx: str) -> str:
    """SELECT-list fragment (DuckDB lateral column aliases) applying the
    murmur finalizer to fold-state ``h`` with byte length ``n``; the signed
    32-bit result lands in column ``out``. ``pfx`` namespaces the step
    aliases so several finalizers can share one SELECT."""
    return f"""
      xor({h}, {n}) AS {pfx}0,
      xor({pfx}0, {pfx}0 >> 16) AS {pfx}1,
      (({pfx}1::HUGEINT * 2246822507) % {_M32})::BIGINT AS {pfx}2,
      xor({pfx}2, {pfx}2 >> 13) AS {pfx}3,
      (({pfx}3::HUGEINT * 3266489909) % {_M32})::BIGINT AS {pfx}4,
      xor({pfx}4, {pfx}4 >> 16) AS {pfx}5,
      CASE WHEN {pfx}5 >= 2147483648 THEN {pfx}5 - {_M32}
           ELSE {pfx}5 END AS {out}"""


def murmur32_string_aliases(s: str, out: str, pfx: str) -> str:
    """SELECT-list fragment computing Spark ``hash(s)`` for an ASCII string
    expression ``s`` into column ``out`` (signed int32 domain)."""
    return (
        f"{murmur_fold_sql(s)} AS {pfx}_h,"
        + fmix_aliases(f"{pfx}_h", f"length({s})", out, f"{pfx}f")
    )


def hashlong_aliases(col: str, seed: str, out: str, pfx: str) -> str:
    """SELECT-list fragment computing Spark ``hash(longCol)`` with chaining
    seed expression ``seed`` (itself signed-int32): mixes the low then high
    32-bit halves, fmix with length 8 — Spark's hashLong. ``col`` must be a
    BIGINT expression (two's complement halves are taken mod 2^32)."""
    useed = f"(({seed}) % {_M32} + {_M32}) % {_M32}"
    lo = f"((({col}) % {_M32} + {_M32}) % {_M32})"
    hi = f"((({col}) >> 32) % {_M32} + {_M32}) % {_M32}"
    h1 = _mixh1(f"({useed})", _mixk1(f"{pfx}_lo"))
    h2 = _mixh1(f"{pfx}_m1", _mixk1(f"{pfx}_hi"))
    return (
        f"{lo} AS {pfx}_lo, ({hi}) AS {pfx}_hi, {h1} AS {pfx}_m1,"
        f" {h2} AS {pfx}_m2,"
        + fmix_aliases(f"{pfx}_m2", "8", out, f"{pfx}f")
    )
