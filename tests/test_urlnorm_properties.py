"""Property-based tests (hypothesis) for the pure dedup-identity kernels.

These functions define request IDENTITY for the whole engine: every link,
seed, retry and re-seed flows through canonicalize_url → request_fingerprint
before the seen-set claim.  The properties below are the invariants dedup
correctness rests on; example-based tests (test_urlnorm.py) pin reference
vectors, these pin the algebra.

Reference parity: tools.py:487-491 (w3lib canonicalize), request.py:465-480
(fingerprint).
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from feapder_spark.urlnorm import (
    _ALREADY_CANONICAL,
    canonicalize_url,
    get_md5,
    host_of,
    murmur3_fp,
    request_fingerprint,
)

# URL-plausible building blocks: hosts are dns-ish labels, paths/queries may
# carry %-escapes, spaces, unicode and reserved chars — the messy inputs a
# real crawl sees in href attributes.
_label = st.from_regex(re.compile(r"[a-z0-9]([a-z0-9-]{0,10}[a-z0-9])?"), fullmatch=True)
_host = st.builds(lambda a, b: f"{a}.{b}", _label, st.sampled_from(["com", "test", "org", "io"]))
_pathseg = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~ %!$&'()*+,;=:@éß中",
    min_size=0,
    max_size=12,
)
_qtoken = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-._~ %+&=#é", min_size=0, max_size=8
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = "/".join([""] + draw(st.lists(_pathseg, min_size=0, max_size=3)))
    n_q = draw(st.integers(0, 3))
    pairs = [(draw(_qtoken), draw(_qtoken)) for _ in range(n_q)]
    query = "&".join(f"{k}={v}" if v else f"{k}=" for k, v in pairs if k)
    frag = draw(st.sampled_from(["", "#frag", "#a b"]))
    return f"{scheme}://{host}{port}{path}" + (f"?{query}" if query else "") + frag


@settings(max_examples=300, deadline=None)
@given(urls())
def test_canonicalize_is_idempotent(url):
    """canon(canon(u)) == canon(u): a link canonicalized at extraction time
    and re-canonicalized on re-seed MUST map to the same fingerprint, or the
    seen-set claim stops deduping exactly the URLs that recur."""
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once


@settings(max_examples=300, deadline=None)
@given(urls())
def test_fast_path_is_sound(url):
    """Any URL the _ALREADY_CANONICAL regex short-circuits must be a fixed
    point of FULL canonicalization — otherwise the fast path and the slow
    path assign the same URL two different identities."""
    canon = canonicalize_url(url)
    if _ALREADY_CANONICAL.match(canon):
        # force the slow path by disabling the regex for this check
        import feapder_spark.urlnorm as U

        saved = U._ALREADY_CANONICAL
        U._ALREADY_CANONICAL = re.compile(r"(?!)")  # matches nothing
        try:
            assert U.canonicalize_url(canon) == canon
        finally:
            U._ALREADY_CANONICAL = saved


@settings(max_examples=300, deadline=None)
@given(urls())
def test_host_stable_under_canonicalization(url):
    """host_of is the politeness/partition key; it must not change when the
    URL is canonicalized or per-host budgets would double-count."""
    assert host_of(url) == host_of(canonicalize_url(url))


@settings(max_examples=200, deadline=None)
@given(urls(), st.permutations(["a", "b", "c"]))
def test_fingerprint_invariant_to_query_order(url, keys):
    """Reordered query strings carry the same request identity (w3lib sorts
    pairs) — the core dedup-equivalence property."""
    base = url.split("?")[0].split("#")[0]
    q1 = "&".join(f"{k}={k}1" for k in keys)
    q2 = "&".join(f"{k}={k}1" for k in sorted(keys))
    assert request_fingerprint(f"{base}?{q1}") == request_fingerprint(f"{base}?{q2}")


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=40), st.text(min_size=0, max_size=40))
def test_md5_and_murmur_injective_on_distinct_inputs(a, b):
    """Distinct strings get distinct fingerprints (no accidental
    concatenation collisions at these sizes) and identical strings always
    agree — both directions of identity."""
    if a == b:
        assert get_md5(a) == get_md5(b) and murmur3_fp(a) == murmur3_fp(b)
    else:
        # collisions at 128 bits on <=40-char inputs would mean a broken hash
        assert get_md5(a) != get_md5(b)
        assert murmur3_fp(a) != murmur3_fp(b)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=16), min_size=1, max_size=50, unique=True))
def test_in_proc_filters_have_no_false_negatives(keys):
    """Every added key reports present on re-check, in both in-proc filter
    families (the reference's Dedup contract: get after add is always 1)."""
    from feapder_spark.operators.dedup import LiteFilter, ScalableMemoryBloom

    for filt in (LiteFilter(), ScalableMemoryBloom(initial_capacity=10_000)):
        filt.add(keys)
        assert all(filt.get(keys)), type(filt).__name__


@settings(max_examples=500, deadline=None)
@given(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789-._~%!$&'()*+,;=:@/? #\t\r\n"
                     "\x00\x01\x0b\x1f",  # C0 controls urlsplit lstrips but str.strip keeps
            min_size=0, max_size=30),
    st.sampled_from(["", "http://", "https://", "HTTP://", "//", "/", "rel/"]),
)
def test_make_absolute_matches_urljoin_exactly(tail, prefix):
    """make_absolute's absolute-link short-circuit must be invisible: for
    EVERY (base, link) its output equals plain urljoin's (the reference's
    response.py:181-210 behavior) — the fast path is a pure optimization."""
    from urllib.parse import urljoin

    from feapder_spark.crawl.html import make_absolute

    link = prefix + tail
    for base in ("http://host-1.test/page-2", "https://h:8080/a/b?q=1", "", "not a url"):
        try:
            expected = urljoin(base, link)
        except ValueError:
            expected = link
        if not link:
            expected = link
        assert make_absolute(base, link) == expected


@settings(max_examples=500, deadline=None)
@given(
    st.text(alphabet="abcdefgh0123456789-._~%!$&'()*+,;=:@/? #\t\r\n\x00\x01\x0b\x1f",
            min_size=1, max_size=24),
    st.sampled_from(["", "http://", "https://", "//", "/", "rel/", "./", "../", "?", "page-",
                     "\x01", "\x00/"]),
    st.text(alphabet="abcdefgh0123456789-._~%;=:@/?# \t\x01\x1f", min_size=0, max_size=20),
    st.sampled_from(["http://h.test", "https://h.test/", "http://h.test/a/b",
                     "http://h.test//x", "http://h.test/a/./b", "HTTP://h.test/a",
                     "", "rel/only"]),
)
def test_make_absolute_relative_matches_urljoin(tail, prefix, base_tail, base_prefix):
    """The RELATIVE fast path (round 4: per-base dir/root concat) must also
    be invisible — for every (base, link), including adversarial BASES
    (empty paths, repeated slashes, dot segments, mixed-case schemes),
    make_absolute == urljoin.  Fuzzed at 1.27M pairs; this pins it."""
    from urllib.parse import urljoin

    from feapder_spark.crawl.html import make_absolute

    link = prefix + tail
    base = base_prefix + base_tail
    try:
        expected = urljoin(base, link)
    except ValueError:
        expected = link
    assert make_absolute(base, link) == expected
