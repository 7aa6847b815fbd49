"""Property tests for SURT canonicalization: idempotence + stability."""

import string

from hypothesis import given, settings, strategies as st

from warcio_ray.frontier.surt import canonicalize, surt, url_hash64, url_to_hash64

host_label = st.text(alphabet=string.ascii_lowercase + string.digits,
                     min_size=1, max_size=8)
path_seg = st.text(alphabet=string.ascii_letters + string.digits + "-_.~",
                   min_size=0, max_size=10)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    labels = draw(st.lists(host_label, min_size=1, max_size=4))
    host = ".".join(labels)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(path_seg, max_size=4))
    path = "/" + "/".join(segs) if segs else ""
    q = draw(st.sampled_from(["", "?b=2&a=1", "?x=%20y", "?a=1&a=0"]))
    frag = draw(st.sampled_from(["", "#frag"]))
    return f"{scheme}://{host}{port}{path}{q}{frag}"


@settings(max_examples=200, deadline=None)
@given(url=urls())
def test_canonicalize_idempotent(url):
    c1 = canonicalize(url)
    assert c1 is not None
    assert canonicalize(c1) == c1          # fixpoint
    s1 = surt(url)
    assert s1 == surt(c1)                  # surt stable through canon
    h = url_to_hash64(url)
    assert h == url_hash64(s1)
    assert 0 <= h < 2 ** 64


@settings(max_examples=100, deadline=None)
@given(url=urls())
def test_case_and_fragment_invariance(url):
    """Host/scheme case and fragments never affect identity."""
    base = surt(url)
    assert surt(url.split("#")[0]) == base
