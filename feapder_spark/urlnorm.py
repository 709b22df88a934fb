"""URL canonicalization + fingerprints — the identity layer of the engine.

Reference semantics (cited into /root/reference, read-only):

- ``canonicalize_url`` — feapder delegates to w3lib (utils/tools.py:487-491,
  import at tools.py:48): sort query params, drop the fragment, normalize
  percent-escapes.  Re-implemented here from the public w3lib/RFC 3986
  behaviour (no w3lib in this image): lowercase scheme+host, drop default
  port, sort query pairs by (key, value), strip fragment, re-quote path and
  query with safe charsets, empty path stays empty.
- ``get_md5`` — md5 over the concatenated ``str(arg)`` of all args
  (utils/tools.py:1902-1915).
- ``request_fingerprint`` — md5(canonical_url [+ body args]) exactly as
  ``Request.fingerprint`` (network/request.py:465-480).
- ``murmur3_x64_128`` — the scale-path 128-bit hash mandated by the north
  star (public MurmurHash3 algorithm, Austin Appleby, public domain).

Everything here is pure Python so the same code runs inside pandas UDFs on
executors and inside the pure-Python reference oracle — identity never
diverges between the two.
"""

from __future__ import annotations

import hashlib
import struct
from urllib.parse import parse_qsl, quote, unquote, urlparse, urlunparse

import re

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

# safe characters per w3lib's canonicalize_url quoting behaviour
_PATH_SAFE = "/;,!$&'()*+=:@"
_QUERY_SAFE = "/;,!$'()*+=:@"

# Fast path: URLs already in canonical form — lowercase scheme+host, no
# port, no query/params/fragment, path made only of unreserved+safe chars
# (for which requoting is the identity).  canonicalize_url() is then the
# identity, so we can skip the urlparse round-trip (it dominates link
# processing cost at ~8 links/page).
_ALREADY_CANONICAL = re.compile(r"^https?://[a-z0-9.\-]+(/[A-Za-z0-9\-._~/]*)?$")


def _requote(text: str, safe: str) -> str:
    """unquote-then-quote so %-escapes are normalized to one canonical form."""
    return quote(unquote(text), safe=safe)


def canonicalize_url(url: str) -> str:
    """w3lib-equivalent canonicalization (tools.py:487-491).

    Sorted query params, fragment removed, normalized percent-encoding,
    lowercased scheme/netloc, default port dropped.
    """
    if not url:
        return url
    if _ALREADY_CANONICAL.match(url):
        return url
    try:
        parts = urlparse(url.strip())
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if parts.port is not None and _DEFAULT_PORTS.get(scheme) == parts.port:
        netloc = netloc.rsplit(":", 1)[0]
    path = _requote(parts.path, _PATH_SAFE)
    # sort query pairs by (key, value); keep blank values (w3lib keeps them)
    pairs = sorted(parse_qsl(parts.query, keep_blank_values=True))
    query = "&".join(
        f"{quote(k, _QUERY_SAFE)}={quote(v, _QUERY_SAFE)}" if v != "" else f"{quote(k, _QUERY_SAFE)}="
        for k, v in pairs
    )
    params = _requote(parts.params, _PATH_SAFE)
    return urlunparse((scheme, netloc, path, params, query, ""))


def get_md5(*args) -> str:
    """md5 over concatenated str(arg) — tools.py:1902-1915."""
    m = hashlib.md5()
    for arg in args:
        m.update(str(arg).encode())
    return m.hexdigest()


def request_fingerprint(url: str, **body) -> str:
    """Request.fingerprint — request.py:465-480.

    md5 of the canonicalized url plus any of params/data/files/auth/cert/json
    present (in that fixed order).
    """
    args = [canonicalize_url(url)]
    for key in ("params", "data", "files", "auth", "cert", "json"):
        if body.get(key):
            args.append(body[key])
    return get_md5(*args)


def host_of(url: str) -> str:
    """Host (lowercased netloc sans port) — the partition/salt key."""
    if _ALREADY_CANONICAL.match(url):
        return url.split("/", 3)[2]
    try:
        netloc = urlparse(url).netloc.lower()
    except ValueError:
        return ""
    return netloc.rsplit(":", 1)[0] if ":" in netloc and netloc.rsplit(":", 1)[1].isdigit() else netloc


# ---------------------------------------------------------------------------
# MurmurHash3 x64 128-bit — public-domain algorithm (Austin Appleby).
# Scale-path fingerprint: two LONG columns (fp_hi, fp_lo) instead of a 32-char
# md5 string halves seen-set bytes at 1e10 keys and hashes ~3× faster.
# ---------------------------------------------------------------------------

_MASK64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64_128; returns (h1, h2) as unsigned 64-bit ints."""
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    length = len(data)
    h1 = h2 = seed & _MASK64
    nblocks = length // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    tl = len(tail)
    if tl >= 9:
        for i in range(tl - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
    if tl > 0:
        for i in range(min(tl, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def murmur3_fp(key: str, seed: int = 0) -> tuple[int, int]:
    """(fp_hi, fp_lo) as *signed* 64-bit ints (Spark LongType-compatible)."""
    h1, h2 = murmur3_x64_128(key.encode("utf-8"), seed)
    to_signed = lambda v: v - (1 << 64) if v >= (1 << 63) else v  # noqa: E731
    return to_signed(h1), to_signed(h2)
