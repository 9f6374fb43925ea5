"""URL canonicalization + MurmurHash3 with Spark parity.

The reference crawler never canonicalizes URLs (it builds them from format
templates, e.g. /root/reference/suplicmap_tilemap.py:91 and
/root/reference/getDirection.py:99-100) and dedups implicitly via disjoint
ObjectID ranges (/root/reference/suplicmap_vector.py:146-151).  A distributed
frontier needs an explicit canonical form + a stable 32-bit hash so that
``repartition(N, "host_hash")`` places every URL of one host in one partition.

``murmur3_32`` is a pure-Python Murmur3 x86_32 that reproduces Spark's
``pyspark.sql.functions.hash`` for string input **bit-for-bit** (Spark mixes
tail bytes one-at-a-time as sign-extended ints, unlike the canonical murmur3
tail; seed 42).  Parity is asserted in tests/test_urlnorm.py, so the driver
(JVM) side and the oracle (Python) side agree on every partition assignment.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_MASK = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def murmur3_32(data: bytes | str, seed: int = 42) -> int:
    """Murmur3 x86_32 exactly as Spark's ``Murmur3Hash`` expression computes
    it for binary/string input (``hashUnsafeBytes``): little-endian 4-byte
    words, then each tail byte mixed individually as a *sign-extended* int.
    Returns a signed 32-bit int (Spark's ``hash()`` output domain).
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    h1 = seed & _MASK
    n = len(data)
    aligned = n - (n % 4)
    for i in range(0, aligned, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:  # sign-extend the byte like JVM's (int) byte cast
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    out = _fmix(h1, n)
    return out - (1 << 32) if out >= (1 << 31) else out


def murmur3_32_batch(frames, seed: int = 42):
    """Vectorized ``murmur3_32`` over a batch of byte strings — numpy over
    the whole batch (one vectorized pass per 4-byte word position plus one
    per tail byte), bit-parity with the scalar reference and Spark's
    ``hash()`` asserted in tests. Returns an int32 ndarray.

    This is the house batch-kernel style (textstats.rolling_fingerprint_batch)
    applied to murmur: per-row state lives in uint32 arrays, rows shorter
    than the current word/tail position are masked out, and uint32
    arithmetic wraps exactly like the JVM's int math.
    """
    import numpy as np

    n = len(frames)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    lens = np.fromiter((len(f) for f in frames), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    flat = np.frombuffer(b"".join(frames), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pad = max(maxlen, 1)
    idx = starts[:, None] + np.arange(pad)[None, :]
    valid = np.arange(pad)[None, :] < lens[:, None]
    buf = np.where(
        valid, flat[np.minimum(idx, max(len(flat) - 1, 0))], 0
    ).astype(np.uint32)

    c1 = np.uint32(_C1)
    c2 = np.uint32(_C2)

    def rotl(x, r):
        return (x << np.uint32(r)) | (x >> np.uint32(32 - r))

    def mix_k1(k1):
        return rotl(k1 * c1, 15) * c2

    def mix_h1(h1, k1):
        h1 = h1 ^ k1
        return rotl(h1, 13) * np.uint32(5) + np.uint32(0xE6546B64)

    h1 = np.full(n, seed, dtype=np.uint32)
    aligned = (lens // 4) * 4
    for w in range(maxlen // 4):
        o = 4 * w
        k1 = (
            buf[:, o]
            | (buf[:, o + 1] << np.uint32(8))
            | (buf[:, o + 2] << np.uint32(16))
            | (buf[:, o + 3] << np.uint32(24))
        )
        mask = (o + 4) <= aligned
        h1 = np.where(mask, mix_h1(h1, mix_k1(k1)), h1)
    # Spark mixes each tail byte individually as a sign-extended int
    for t in range(3):
        pos = aligned + t
        mask = pos < lens
        b = buf[np.arange(n), np.minimum(pos, pad - 1)]
        b = np.where(b >= 128, b | np.uint32(0xFFFFFF00), b)
        h1 = np.where(mask, mix_h1(h1, mix_k1(b)), h1)

    h1 = h1 ^ lens.astype(np.uint32)
    h1 = h1 ^ (h1 >> np.uint32(16))
    h1 = h1 * np.uint32(0x85EBCA6B)
    h1 = h1 ^ (h1 >> np.uint32(13))
    h1 = h1 * np.uint32(0xC2B2AE35)
    h1 = h1 ^ (h1 >> np.uint32(16))
    return h1.view(np.int32)


def canonicalize_url(url: str, base: str | None = None) -> str | None:
    """Deterministic canonical form: resolve against ``base``, lowercase
    scheme+host, strip fragment and default port, empty path → ``/``.
    Returns None for non-http(s) or unparseable URLs.
    """
    if base:
        url = urljoin(base, url)
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.lower().rstrip(".")
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    # resolve dot segments deterministically
    segs: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if segs:
                segs.pop()
        elif seg != ".":
            segs.append(seg)
    path = "/".join(segs)
    if not path.startswith("/"):
        path = "/" + path
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def host_of(url: str) -> str:
    """Host component of a canonical URL (cheap split, no full parse) —
    the engine analog of /root/reference/suplicmap_vector2.py:63-66's
    path-segment split."""
    rest = url.split("://", 1)[-1]
    authority = rest.split("/", 1)[0]
    return authority.split("@")[-1].split(":")[0].lower()
