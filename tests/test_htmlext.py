"""Golden tests for the real-HTML extraction kernel (kernels/htmlext):
tag stripping, script/style/comment removal, entity decoding, whitespace
normalization, <base>-aware relative-href resolution."""

from warc_spark.kernels.htmlext import extract_links, html_to_text, redecode_utf8


class TestHtmlToText:
    def test_nested_tags_and_structure(self):
        html = (
            "<html><head><title>My Page</title></head><body>"
            "<div><p>Hello <b>bold</b> and <i>italic <u>deep</u></i> world.</p>"
            "<ul><li>one</li><li>two</li></ul></div></body></html>"
        )
        assert html_to_text(html) == (
            "My Page\nHello bold and italic deep world.\none\ntwo"
        )

    def test_script_style_comment_removed(self):
        html = (
            "<body><!-- nav starts -->"
            "<script>var s = '<p>fake para</p>';</script>"
            "<style>p { color: red }</style>"
            "<noscript>enable js</noscript>"
            "<p>real text</p></body>"
        )
        assert html_to_text(html) == "real text"

    def test_entities_decoded_after_stripping(self):
        html = "<p>Tom &amp; Jerry &lt;3 &#169; caf&eacute; &#x2014; end</p>"
        assert html_to_text(html) == "Tom & Jerry <3 © café — end"

    def test_whitespace_normalization(self):
        html = "<div>  a   lot\t of\n  space  </div><div>next   block</div>"
        assert html_to_text(html) == "a lot of\nspace\nnext block"

    def test_br_and_blank_lines_collapse(self):
        assert html_to_text("x<br><br><br>y") == "x\ny"

    def test_none_and_empty(self):
        assert html_to_text(None) is None
        assert html_to_text("") == ""
        assert html_to_text("<script>x</script>") == ""


class TestExtractLinks:
    BASE = "http://host.example.com/a/b/page.html"

    def test_relative_resolution(self):
        html = (
            '<a href="c.html">1</a>'
            '<a href="../up.html">2</a>'
            '<a href="/rooted">3</a>'
            '<a href="//other.example.org/x">4</a>'
            '<a href="https://abs.example.net/y">5</a>'
        )
        assert extract_links(html, self.BASE) == [
            "http://host.example.com/a/b/c.html",
            "http://host.example.com/a/up.html",
            "http://host.example.com/rooted",
            "http://other.example.org/x",
            "https://abs.example.net/y",
        ]

    def test_base_tag_rebases(self):
        html = (
            '<head><base href="http://cdn.example.com/root/"></head>'
            '<body><a href="rel.html">x</a></body>'
        )
        assert extract_links(html, self.BASE) == [
            "http://cdn.example.com/root/rel.html"
        ]

    def test_relative_base_resolves_against_page(self):
        html = '<base href="sub/"><a href="f.html">x</a>'
        assert extract_links(html, self.BASE) == [
            "http://host.example.com/a/b/sub/f.html"
        ]

    def test_quote_styles_and_entities(self):
        html = (
            "<a href='single.html'>s</a>"
            "<a href=unquoted.html>u</a>"
            '<a href="q.html?a=1&amp;b=2">e</a>'
        )
        assert extract_links(html, self.BASE) == [
            "http://host.example.com/a/b/single.html",
            "http://host.example.com/a/b/unquoted.html",
            "http://host.example.com/a/b/q.html?a=1&b=2",
        ]

    def test_skips_fragments_and_schemes(self):
        html = (
            '<a href="#top">f</a>'
            '<a href="javascript:void(0)">j</a>'
            '<a href="mailto:x@example.com">m</a>'
            '<a href="tel:+1555">t</a>'
            '<a href="data:text/plain,hi">d</a>'
            '<a href="real.html#sec2">r</a>'
        )
        assert extract_links(html, self.BASE) == [
            "http://host.example.com/a/b/real.html"
        ]

    def test_links_in_comments_and_scripts_ignored(self):
        html = (
            '<!-- <a href="dead.html">x</a> -->'
            '<script>document.write(\'<a href="gen.html">g</a>\');</script>'
            '<a href="live.html">l</a>'
        )
        assert extract_links(html, self.BASE) == [
            "http://host.example.com/a/b/live.html"
        ]

    def test_area_and_multiline_tags(self):
        html = '<area\n  shape="rect"\n  href="map.html">'
        assert extract_links(html, self.BASE) == [
            "http://host.example.com/a/b/map.html"
        ]

    def test_none_html(self):
        assert extract_links(None, self.BASE) == []


class TestRedecodeUtf8:
    """Charset fix-up for the byte-preserving latin-1 ingest path."""

    def test_utf8_bytes_redecoded(self):
        # "café" as utf-8 bytes, read back through a latin-1 decode
        raw = "café".encode("utf-8").decode("latin-1")
        assert raw == "cafÃ©"  # the mojibake shape
        assert redecode_utf8(raw) == "café"

    def test_real_latin1_preserved(self):
        # 0xE9 alone is invalid utf-8 -> stays the latin-1 decode
        raw = b"caf\xe9".decode("latin-1")
        assert redecode_utf8(raw) == "café"

    def test_ascii_and_none_unchanged(self):
        assert redecode_utf8("plain ascii") == "plain ascii"
        assert redecode_utf8(None) is None

    def test_already_decoded_passthrough(self):
        # a string that cannot round-trip to latin-1 was decoded upstream
        assert redecode_utf8("已解码") == "已解码"

    def test_pipeline_with_utf8_page(self):
        body = "<p>Zoë &amp; 中文</p>".encode("utf-8").decode("latin-1")
        assert html_to_text(redecode_utf8(body)) == "Zoë & 中文"


class TestFramingRobustness:
    """ADVICE r3 (high): a record whose payload lacks the \r\n\r\n framing
    (truncated / non-HTTP capture) must yield null text/links, not fail the
    task — pandas .str[2] returns float NaN for it, and the kernels must
    normalize that before the Python extraction loops."""

    def _mk(self, *payloads):
        import pandas as pd

        return pd.Series([p if p is None else bytearray(p) for p in payloads])

    def test_page_html_kernel_unframed_record(self):
        import pandas as pd

        from warc_spark.sources.pages import extract_page_html_kernel

        good = b"WARC/1.0\r\nX: y\r\n\r\nHTTP/1.1 200 OK\r\n\r\n<p>hi</p>"
        bad = b"WARC/1.0 truncated-without-framing"
        out = extract_page_html_kernel(
            self._mk(good, bad, None),
            pd.Series(["http://a/", "http://b/", "http://c/"]),
        )
        assert out["text"].tolist()[0] == "hi"
        assert out["text"].tolist()[1] is None
        assert out["text"].tolist()[2] is None
        assert out["links"].tolist()[1] is None

    def test_text_html_payload_kernel_unframed_record(self):
        from warc_spark.sources.pages import extract_text_html_from_payload_kernel

        good = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>ok</p>"
        bad = b"no-framing-here"
        out = extract_text_html_from_payload_kernel(self._mk(good, bad, None))
        assert out.tolist() == ["ok", None, None]

    def test_synthetic_payload_kernel_null_payload(self):
        from warc_spark.sources.pages import extract_text_from_payload_kernel

        out = extract_text_from_payload_kernel(self._mk(None, b"junk"))
        assert out.isna().all()
