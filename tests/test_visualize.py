"""SVG result visualizations (tools/visualize.py) — the reference's
results/*.png analogs (end_to_end_prediction.py:537-616), rendered
dependency-free from Spark-side reductions: only bin/cell/top-k
aggregates reach the driver."""

from __future__ import annotations

import xml.etree.ElementTree as ET

NS = {"s": "http://www.w3.org/2000/svg"}


def test_visualize_builds_the_three_reference_figures(spark, tmp_path):
    from tools.visualize import build_all

    out = build_all(spark, "/root/testdata/sf0.001", str(tmp_path), n_bins=20)
    assert set(out) == {
        "anomaly_score_distribution", "confusion_matrix", "anomaly_templates"
    }

    hist = ET.parse(out["anomaly_score_distribution"]).getroot()
    bars = hist.findall(".//s:path", NS)
    assert 1 <= len(bars) <= 21  # bins with rows, + nothing else
    # the threshold reference line + its direct label exist
    assert hist.findall(".//s:line[@stroke-dasharray]", NS)
    assert any(
        "q95 threshold" in (t.text or "") for t in hist.findall(".//s:text", NS)
    )
    # every bar carries a hover tooltip
    assert all(p.find("s:title", NS) is not None for p in bars)

    cm = ET.parse(out["confusion_matrix"]).getroot()
    cells = [r for r in cm.findall(".//s:rect", NS) if r.get("class") != "surface"]
    assert len(cells) == 4  # binary matrix, like the reference's
    labels = {t.text for t in cm.findall(".//s:text", NS)}
    assert {"normal", "anomaly"} <= labels
    # cell counts cover the whole embeddings table
    total = sum(
        int(c.find("s:title", NS).text.rsplit(": ", 1)[1]) for c in cells
    )
    n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert total == n

    tpl = ET.parse(out["anomaly_templates"]).getroot()
    tbars = tpl.findall(".//s:path", NS)
    assert 2 <= len(tbars) <= 10
    names = [b.find("s:title", NS).text for b in tbars]
    assert all("<*>" in x for x in names)  # digits masked in every template

    # theming: light AND dark palettes declared, text in ink tokens
    for path in out.values():
        src = open(path).read()
        assert "prefers-color-scheme:dark" in src
        assert "class='surface'" in src
