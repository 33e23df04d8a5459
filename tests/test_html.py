"""HTML → text main-content extraction (operators/html.py, F32)."""

from __future__ import annotations

from karna_spark.operators.html import extract_main_content


def _one(spark, html: str, **kw):
    df = spark.createDataFrame([(html,)], "html string")
    return extract_main_content(df, "html", **kw).collect()[0]


def test_payload_and_comment_never_leak(spark):
    r = _one(
        spark,
        "<html><head><style>p{x:1}</style>"
        "<script>var s='SECRET';</script></head>"
        "<body><!-- HIDDEN --><p>real prose here</p></body></html>",
    )
    assert r["main_text"] == "real prose here"
    for trap in ("SECRET", "HIDDEN", "x:1"):
        assert trap not in r["main_text"]


def test_chrome_containers_removed(spark):
    r = _one(
        spark,
        "<body><nav><p>Home</p></nav><header><p>Masthead</p></header>"
        "<p>the article body</p>"
        "<aside><p>related</p></aside><footer><p>legal</p></footer></body>",
    )
    # chrome is removed WHOLE — even block tags inside it never become
    # candidate blocks
    assert r["main_text"] == "the article body"
    assert r["blocks_kept"] == 1


def test_link_density_drops_boilerplate_keeps_prose(spark):
    prose = "a paragraph with one <a href='/x'>inline link</a> in prose text"
    links = '<a href="/1">more</a> <a href="/2">links</a>'
    r = _one(spark, f"<body><p>{prose}</p><div>{links}</div></body>")
    assert r["blocks_kept"] == 1 and r["blocks_dropped"] == 1
    assert r["main_text"].startswith("a paragraph with one inline link")
    assert "more links" not in r["main_text"]


def test_entity_decode_and_double_escape_order(spark):
    r = _one(
        spark,
        "<body><p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;"
        " &amp;lt;literal&amp;gt;</p></body>",
    )
    # &amp; decodes LAST: double-escaped text yields the literal entity
    assert r["main_text"] == "A & B <tag> \"q\" 's' &lt;literal&gt;"


def test_whitespace_only_block_dropped_and_ws_normalized(spark):
    r = _one(
        spark,
        "<body><p>two\n   words\t here</p><div>   </div></body>",
    )
    assert r["main_text"] == "two words here"
    assert r["blocks_kept"] == 1 and r["blocks_dropped"] == 1


def test_tags_become_spaces_no_word_fusion(spark):
    r = _one(spark, "<body><p><b>bold</b><i>italic</i></p></body>")
    assert r["main_text"] == "bold italic"


def test_nested_same_tag_documented_limit(spark):
    # regex blocks terminate at the FIRST matching close tag — the
    # documented non-tree-parser scope; the outer remainder is not a
    # block (no opening tag survives), so content before the inner
    # close is what's kept.
    r = _one(spark, "<body><div>outer <div>inner</div> tail</div></body>")
    assert r["main_text"] == "outer inner"


def test_ratio_accounting(spark):
    html = "<body><p>abcdefghij</p></body>"
    r = _one(spark, html)
    assert r["html_chars"] == len(html)
    assert r["text_chars"] == 10
    assert abs(r["chrome_ratio"] - round(1 - 10 / len(html), 4)) < 1e-9


def test_max_link_density_knob(spark):
    # half the text is anchor text: dropped at 0.4, kept at 0.6
    block = "<p><a href='/x'>12345</a>12345</p>"
    lo = _one(spark, f"<body>{block}</body>", max_link_density=0.4)
    hi = _one(spark, f"<body>{block}</body>", max_link_density=0.6)
    assert lo["blocks_kept"] == 0 and hi["blocks_kept"] == 1
