"""Extraction head tests: boilerplate strip, link density, span sequences."""

import re

import pytest

from htmlreader_ray.kernel.extract import (ExtractConfig, Extractor,
                                           normalize_media_ref)
from htmlreader_ray.sources.corpus import build_page


@pytest.fixture(scope="module")
def ex():
    return Extractor()


def test_strip_script_style_nav(ex):
    html = ("<body><nav><a href=/>Home</a></nav><script>var x;</script>"
            "<style>p{}</style><p>Main content here</p>"
            "<footer>legal</footer></body>")
    assert ex.extract_html(html) == "Main content here"


def test_hidden_removed(ex):
    html = "<body><div hidden>gone</div><div aria-hidden=true>gone</div><p>kept</p></body>"
    assert ex.extract_html(html) == "kept"


def test_link_density_pruning(ex):
    html = ("<body><ul><li><a href=1>l1</a><li><a href=2>l2</a>"
            "<li><a href=3>l3</a></ul>"
            "<p>This paragraph has plenty of real text and no links at all, "
            "so it must survive the density filter.</p></body>")
    out = ex.extract_html(html)
    assert "survive" in out
    assert "l1" not in out


def test_link_heavy_but_long_text_survives(ex):
    body_text = "word " * 50
    html = (f"<body><p>{body_text}<a href=x>one link</a></p></body>")
    out = ex.extract_html(html)
    assert "one link" in out


def test_whitespace_collapse(ex):
    assert ex.extract_html("<p>a\n\n  b\tc</p>") == "a b c"


def test_no_collapse_config():
    ex2 = Extractor(ExtractConfig(collapse_whitespace=False))
    assert ex2.extract_html("<body>a  b</body>") == "a  b"


def test_extract_spans_ordering(ex):
    spans = [
        {"kind": "media", "text": "", "media_ref": "MEDIA://a/b.png",
         "offset": 1},
        {"kind": "text", "text": "<p>first</p>", "media_ref": "",
         "offset": 0},
        {"kind": "text", "text": "<p>third</p>", "media_ref": "",
         "offset": 2},
    ]
    out = ex.extract_spans(spans)
    assert [(s["kind"], s["order"]) for s in out] == [
        ("text", 0), ("media", 1), ("text", 2)]
    assert out[0]["text"] == "first"
    assert out[1]["media_ref"] == "media://a/b.png"


def test_empty_html_span_dropped(ex):
    spans = [
        {"kind": "text", "text": "<script>junk()</script>", "media_ref": "",
         "offset": 0},
        {"kind": "media", "text": "", "media_ref": "media://x", "offset": 1},
    ]
    out = ex.extract_spans(spans)
    assert [(s["kind"], s["order"]) for s in out] == [("media", 0)]


def test_media_ref_normalization():
    assert normalize_media_ref("  MEDIA://A/b.PNG ") == "media://A/b.PNG"
    assert normalize_media_ref("relative/path.png") == "relative/path.png"


@pytest.mark.parametrize("variant", range(5))
def test_build_page_roundtrip_all_variants(ex, variant):
    text = "The quick brown fox & friends <jump> over 2 lazy dogs."
    page = build_page(variant, text)
    want = re.sub(r"\s+", " ", text).strip()
    assert ex.extract_html(page) == want


def test_text_density_pruning_opt_in():
    # markup-heavy chrome: many elements, little text
    chrome = "<div id=junk>" + "".join(
        f"<span><em><i>{c}</i></em></span>" for c in "abcdefgh") + "</div>"
    prose = ("<p>This paragraph is ordinary running prose with plenty of "
             "characters and no markup inside it at all.</p>")
    html = f"<body>{chrome}{prose}</body>"
    default = Extractor()
    assert "abcdefgh" in default.extract_html(html).replace(" ", "")
    strict = Extractor(ExtractConfig(min_text_density=3.0))
    out = strict.extract_html(html)
    assert "running prose" in out
    assert "a b c" not in out and "abcdefgh" not in out.replace(" ", "")


def test_extractor_config_cache_alternation():
    """The C extractor caches the compiled rule set keyed on config object
    identity + scalar knobs; alternating extractors must never leak one
    another's rules (regression for the cextract config cache)."""
    from htmlreader_ray.kernel.extract import ExtractConfig, Extractor
    keep_all = Extractor(ExtractConfig(remove_selectors=(),
                                       max_link_density=1.0))
    strip = Extractor(ExtractConfig(
        remove_selectors=("nav", ".ad", "#x", "[data-junk]")))
    tight_ld = Extractor(ExtractConfig(remove_selectors=(),
                                       max_link_density=0.01))
    doc = ('<body><nav>menu</nav><p class="ad">buy now today</p>'
           '<p>keep this text</p><div id="x">gone away</div>'
           '<span data-junk="1">junky stuff</span></body>')
    linky = ('<body><div><a href=x>lots of link text here</a> t</div>'
             '<p>real prose body text</p></body>')
    for _ in range(8):
        assert "menu" in keep_all.extract_html(doc)
        assert strip.extract_html(doc) == "keep this text"
        assert "lots of link" in keep_all.extract_html(linky)
        assert "lots of link" not in tight_ld.extract_html(linky)
