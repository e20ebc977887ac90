"""Report layer: chart generators and the end-to-end HTML dashboard.
No browser in this container, so validation is structural: parseable
HTML, sane SVG geometry, a data table next to every chart, tooltips,
dark-mode tokens, and the bounded-frame guard."""

from __future__ import annotations

from html.parser import HTMLParser

import pytest

from nyc_taxi_etl_spark.report import (
    MAX_ROWS,
    build_report,
    stat_tile,
    svg_bar_chart,
    svg_line_chart,
)


class _Parser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tags: list[str] = []
        self.stack: list[str] = []
        self.balanced = True

    VOID = {"meta", "line", "rect", "circle", "path", "br", "img"}

    def handle_starttag(self, tag, attrs):
        self.tags.append(tag)
        if tag not in self.VOID:
            self.stack.append(tag)

    def handle_endtag(self, tag):
        if tag in self.VOID:
            return
        if not self.stack or self.stack[-1] != tag:
            self.balanced = False
        else:
            self.stack.pop()


def test_bar_chart_geometry_and_tooltips():
    svg = svg_bar_chart([("a", 10.0), ("b", 0.0), ("c", 25.0)], "t")
    assert "nan" not in svg.lower() and "inf" not in svg.lower()
    assert svg.count("<title>") == 6  # mark + full-height hit target per bar
    assert "rx='4'" in svg  # rounded data-end
    assert "height='0.0'" in svg  # zero value draws a zero-height bar
    # baseline-anchored: every bar bottom is on the axis
    import re

    bars = re.findall(r"class='bar' x='[\d.]+' y='([\d.]+)' width.*?height='([\d.]+)'", svg)
    bottoms = {round(float(y) + float(h), 1) for y, h in bars}
    assert len(bottoms) == 1


def test_line_chart_legend_and_series_cap():
    pts = [("d1", 1.0), ("d2", 2.0)]
    two = svg_line_chart({"a": pts, "b": pts}, "t")
    assert "legend" in two and "class='line2'" in two
    assert "too many series" in svg_line_chart(
        {f"s{i}": pts for i in range(4)}, "t"
    )


def test_stat_tile_formats():
    assert "1,234" in stat_tile("rows", 1234)


@pytest.fixture(scope="module")
def report_path(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("report") / "report.html"
    return build_report(spark, "/root/testdata/sf0.001", str(out))


def test_report_structure(report_path):
    doc = open(report_path).read()
    p = _Parser()
    p.feed(doc)
    assert p.balanced and not p.stack, "unbalanced HTML"
    assert p.tags.count("h2") == 11  # one section per analysis
    assert p.tags.count("svg") == 9  # stat tiles are not charts
    # every chart section ships its data table
    assert p.tags.count("table") == 10
    assert "prefers-color-scheme: dark" in doc  # selected dark mode
    assert "nan" not in doc.lower()
    # text never wears series color: labels use the lbl/text classes
    assert "class='lbl'" in doc


def test_unbounded_frame_refused(spark):
    from nyc_taxi_etl_spark.report import _collect
    from nyc_taxi_etl_spark.sources.catalog import load_table

    big = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    if big.count() > MAX_ROWS:
        with pytest.raises(ValueError, match="unbounded"):
            _collect(big)
