"""URL canonicalization + fingerprint identity (request.py:465-480 semantics)."""

from feapder_spark.urlnorm import (
    canonicalize_url,
    get_md5,
    host_of,
    murmur3_fp,
    murmur3_x64_128,
    request_fingerprint,
)


def test_canonicalize_sorts_query_and_strips_fragment():
    assert (
        canonicalize_url("http://Host-1.test/page?b=2&a=1#frag")
        == "http://host-1.test/page?a=1&b=2"
    )


def test_canonicalize_drops_default_port():
    assert canonicalize_url("http://host.test:80/x") == "http://host.test/x"
    assert canonicalize_url("https://host.test:443/x") == "https://host.test/x"
    assert canonicalize_url("http://host.test:8080/x") == "http://host.test:8080/x"


def test_canonicalize_normalizes_percent_encoding():
    assert canonicalize_url("http://h.test/a%7Eb") == canonicalize_url("http://h.test/a~b")


def test_canonicalize_keeps_blank_params():
    assert canonicalize_url("http://h.test/p?a=&b=1") == "http://h.test/p?a=&b=1"


def test_get_md5_matches_reference_doc_example():
    # tools.py:1902-1915 docstring example
    assert len(get_md5("x")) == 32
    assert get_md5("a", "b") == get_md5("ab") or get_md5("a", "b") != ""  # concat of str(arg)
    import hashlib

    assert get_md5("hello") == hashlib.md5(b"hello").hexdigest()
    assert get_md5(1, "a") == hashlib.md5(b"1a").hexdigest()


def test_fingerprint_equal_for_equivalent_urls():
    fp1 = request_fingerprint("http://h.test/p?b=2&a=1#x")
    fp2 = request_fingerprint("http://h.test/p?a=1&b=2")
    assert fp1 == fp2
    assert fp1 != request_fingerprint("http://h.test/p?a=1&b=3")


def test_fingerprint_includes_body_args_in_fixed_order():
    base = request_fingerprint("http://h.test/p")
    with_data = request_fingerprint("http://h.test/p", data={"k": "v"})
    assert base != with_data


def test_host_of():
    assert host_of("http://Host-3.test:8080/x?y=1") == "host-3.test"
    assert host_of("https://a.b.c/") == "a.b.c"


def test_murmur3_known_vectors():
    # public MurmurHash3 x64_128 test vectors (seed 0)
    h1, h2 = murmur3_x64_128(b"", 0)
    assert (h1, h2) == (0, 0)
    h1, h2 = murmur3_x64_128(b"hello", 0)
    # cross-checked against the reference C++/mmh3 implementation output
    assert h1 == 0xCBD8A7B341BD9B02 and h2 == 0x5B1E906A48AE1D19


def test_murmur3_fp_signed_range():
    hi, lo = murmur3_fp("http://h.test/")
    assert -(2**63) <= hi < 2**63 and -(2**63) <= lo < 2**63
