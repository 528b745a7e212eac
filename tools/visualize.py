"""Dependency-free SVG result visualizations.

The reference ships three matplotlib PNGs (end_to_end_prediction.py:537-616:
an anomaly-score histogram with the 95th-percentile threshold line, a
confusion-matrix heatmap, and top-template bar charts). This tool renders
the same three figures from THIS engine's distributed queries as plain SVG
(no plotting library exists in the sandbox, and none is needed): every
reduction — histogram binning, exact percentile, confusion cells, top-k
template counts — happens in Spark, and only the ~50 bin counts / 4 cells /
10 bars ever reach the driver, so the tool is unchanged at 100 TB.

Charts follow one system: a single categorical hue per chart (series blue),
a reserved status red for the threshold reference line, text in ink tokens
(never the series color), recessive grid, 2px gaps between fills, rounded
data-ends anchored to the baseline, per-mark <title> hover tooltips, and a
light/dark theme selected via prefers-color-scheme (per-cell heatmap steps
are generated for BOTH surfaces, not flipped).

Usage: python tools/visualize.py [--sf-dir /root/testdata/sf0.01] [--out results]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# -- palette (validated: scripts/validate_palette.js, light+dark) -----------
LIGHT = {
    "surface": "#fcfcfb", "ink": "#0b0b0b", "ink2": "#52514e",
    "grid": "#e4e3df", "series": "#2a78d6", "status": "#e34948",
}
DARK = {
    "surface": "#1a1a19", "ink": "#ffffff", "ink2": "#c3c2b7",
    "grid": "#3a3936", "series": "#3987e5", "status": "#e66767",
}
FONT = "font-family='system-ui,sans-serif'"


def _style(extra_light: str = "", extra_dark: str = "") -> str:
    def block(p, extra):
        return (
            f".surface{{fill:{p['surface']}}} .ink{{fill:{p['ink']}}}"
            f".ink2{{fill:{p['ink2']}}} .grid{{stroke:{p['grid']}}}"
            f".series{{fill:{p['series']}}} .status{{stroke:{p['status']}}}"
            f".statusink{{fill:{p['status']}}}" + extra
        )

    return (
        "<style>" + block(LIGHT, extra_light)
        + "@media(prefers-color-scheme:dark){" + block(DARK, extra_dark) + "}"
        + "</style>"
    )


def _bar_path(x: float, y: float, w: float, h: float, r: float = 2.0) -> str:
    """Bar with the DATA end rounded (top for columns), baseline square."""
    r = min(r, w / 2, max(h, 0.01))
    return (
        f"M{x:.2f},{y + h:.2f} v{-(h - r):.2f} q0,{-r:.2f} {r:.2f},{-r:.2f} "
        f"h{w - 2 * r:.2f} q{r:.2f},0 {r:.2f},{r:.2f} v{h - r:.2f} z"
    )


def _esc(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _fmt(v: float) -> str:
    return f"{v:.4g}"


def svg_histogram(bins: list[tuple[float, float, int]], threshold: float,
                  title: str, xlabel: str) -> str:
    """bins: (lo, hi, count) per bucket; threshold drawn as a labeled
    dashed status line (the reference's axvline)."""
    W, H, ML, MR, MT, MB = 760, 420, 56, 16, 52, 46
    pw, ph = W - ML - MR, H - MT - MB
    xmin, xmax = bins[0][0], bins[-1][1]
    ymax = max(c for _, _, c in bins) or 1

    def sx(v):
        return ML + (v - xmin) / (xmax - xmin or 1) * pw

    def sy(c):
        return MT + ph - c / ymax * ph

    out = [
        f"<svg xmlns='http://www.w3.org/2000/svg' viewBox='0 0 {W} {H}' {FONT}>",
        _style(),
        f"<rect class='surface' width='{W}' height='{H}'/>",
        f"<text class='ink' x='{ML}' y='24' font-size='15' font-weight='600'>{_esc(title)}</text>",
    ]
    # recessive y grid: 4 ticks
    for i in range(1, 5):
        gy = MT + ph - i / 4 * ph
        out.append(
            f"<line class='grid' x1='{ML}' y1='{gy:.1f}' x2='{ML + pw}' y2='{gy:.1f}' stroke-width='1'/>"
        )
        out.append(
            f"<text class='ink2' x='{ML - 6}' y='{gy + 4:.1f}' font-size='11' text-anchor='end'>{int(ymax * i / 4)}</text>"
        )
    # bars: 2px surface gap between fills
    for lo, hi, c in bins:
        if c <= 0:
            continue
        x0, x1 = sx(lo), sx(hi)
        y = sy(c)
        out.append(
            f"<path class='series' d='{_bar_path(x0 + 1, y, x1 - x0 - 2, MT + ph - y)}'>"
            f"<title>[{_fmt(lo)}, {_fmt(hi)}): {c}</title></path>"
        )
    # threshold reference line (status, direct-labeled)
    tx = sx(threshold)
    out.append(
        f"<line class='status' x1='{tx:.1f}' y1='{MT}' x2='{tx:.1f}' y2='{MT + ph}' "
        f"stroke-width='2' stroke-dasharray='6 4'/>"
    )
    anchor = "end" if tx > ML + pw * 0.75 else "start"
    dx = -6 if anchor == "end" else 6
    out.append(
        f"<text class='statusink' x='{tx + dx:.1f}' y='{MT + 14}' font-size='12' "
        f"text-anchor='{anchor}'>q95 threshold = {_fmt(threshold)}</text>"
    )
    # x axis
    out.append(
        f"<line class='grid' x1='{ML}' y1='{MT + ph}' x2='{ML + pw}' y2='{MT + ph}' stroke-width='1'/>"
    )
    for i in range(5):
        v = xmin + i / 4 * (xmax - xmin)
        out.append(
            f"<text class='ink2' x='{sx(v):.1f}' y='{MT + ph + 18}' font-size='11' text-anchor='middle'>{_fmt(v)}</text>"
        )
    out.append(
        f"<text class='ink2' x='{ML + pw / 2}' y='{H - 8}' font-size='12' text-anchor='middle'>{_esc(xlabel)}</text>"
    )
    out.append("</svg>")
    return "".join(out)


def _mix(a: str, b: str, t: float) -> str:
    av = [int(a[i:i + 2], 16) for i in (1, 3, 5)]
    bv = [int(b[i:i + 2], 16) for i in (1, 3, 5)]
    return "#" + "".join(f"{round(x + (y - x) * t):02x}" for x, y in zip(av, bv))


def svg_heatmap(cells: dict[tuple[int, int], int], title: str) -> str:
    """Confusion matrix: sequential single-hue ramp (light→dark per mode),
    value labels in ink chosen per cell luminance, 2px surface gaps."""
    labels = sorted({k[0] for k in cells}), sorted({k[1] for k in cells})
    n_r, n_c = len(labels[0]), len(labels[1])
    CS, ML, MT = 120, 120, 64
    W, H = ML + n_c * CS + 24, MT + n_r * CS + 56
    vmax = max(cells.values()) or 1
    css_l, css_d = [], []
    body = [
        f"<text class='ink' x='{ML}' y='26' font-size='15' font-weight='600'>{_esc(title)}</text>",
        f"<text class='ink2' x='{ML + n_c * CS / 2}' y='{MT - 26}' font-size='12' text-anchor='middle'>Predicted label</text>",
        f"<text class='ink2' x='18' y='{MT + n_r * CS / 2}' font-size='12' text-anchor='middle' transform='rotate(-90 18 {MT + n_r * CS / 2})'>True label</text>",
    ]
    for i, tl in enumerate(labels[0]):
        for j, pl in enumerate(labels[1]):
            v = cells.get((tl, pl), 0)
            t = v / vmax
            cl = f"c{i}_{j}"
            # per-mode sequential steps: light surface ramps white→deep
            # blue; dark surface ramps near-surface→bright blue
            fl, fd = _mix("#eef4fc", "#14417c", t), _mix("#24303f", "#7db3f0", t)
            css_l.append(f".{cl}{{fill:{fl}}}")
            css_d.append(f".{cl}{{fill:{fd}}}")
            x, y = ML + j * CS, MT + i * CS
            body.append(
                f"<rect class='{cl}' x='{x + 1}' y='{y + 1}' width='{CS - 2}' height='{CS - 2}' rx='4'>"
                f"<title>true={tl}, pred={pl}: {v}</title></rect>"
            )
            # ink flips at mid-ramp in BOTH modes (deep fill ⇒ light ink on
            # light surface; bright fill ⇒ dark ink on dark surface)
            ink_l = "#ffffff" if t > 0.55 else LIGHT["ink"]
            ink_d = "#0b0b0b" if t > 0.55 else DARK["ink"]
            vl = f"v{i}_{j}"
            css_l.append(f".{vl}{{fill:{ink_l}}}")
            css_d.append(f".{vl}{{fill:{ink_d}}}")
            body.append(
                f"<text class='{vl}' x='{x + CS / 2}' y='{y + CS / 2 + 5}' font-size='16' text-anchor='middle'>{v}</text>"
            )
    for j, pl in enumerate(labels[1]):
        body.append(
            f"<text class='ink2' x='{ML + j * CS + CS / 2}' y='{MT - 8}' font-size='12' text-anchor='middle'>{_esc(pl)}</text>"
        )
    for i, tl in enumerate(labels[0]):
        body.append(
            f"<text class='ink2' x='{ML - 8}' y='{MT + i * CS + CS / 2 + 4}' font-size='12' text-anchor='end'>{_esc(tl)}</text>"
        )
    return (
        f"<svg xmlns='http://www.w3.org/2000/svg' viewBox='0 0 {W} {H}' {FONT}>"
        + _style("".join(css_l), "".join(css_d))
        + f"<rect class='surface' width='{W}' height='{H}'/>"
        + "".join(body) + "</svg>"
    )


def svg_hbar(items: list[tuple[str, int]], title: str, xlabel: str) -> str:
    """Ranked horizontal bars, one hue, right-end value labels in ink."""
    BH, GAP, ML, MT = 26, 8, 280, 52
    W = 840
    pw = W - ML - 90
    H = MT + len(items) * (BH + GAP) + 40
    vmax = max(v for _, v in items) or 1
    out = [
        f"<svg xmlns='http://www.w3.org/2000/svg' viewBox='0 0 {W} {H}' {FONT}>",
        _style(),
        f"<rect class='surface' width='{W}' height='{H}'/>",
        f"<text class='ink' x='{ML}' y='24' font-size='15' font-weight='600'>{_esc(title)}</text>",
    ]
    for i in range(1, 4):
        gx = ML + i / 3 * pw
        out.append(
            f"<line class='grid' x1='{gx:.1f}' y1='{MT - 6}' x2='{gx:.1f}' y2='{H - 34}' stroke-width='1'/>"
        )
        out.append(
            f"<text class='ink2' x='{gx:.1f}' y='{H - 18}' font-size='11' text-anchor='middle'>{int(vmax * i / 3)}</text>"
        )
    for i, (name, v) in enumerate(items):
        y = MT + i * (BH + GAP)
        w = v / vmax * pw
        label = name if len(name) <= 34 else name[:31] + "…"
        out.append(
            f"<text class='ink2' x='{ML - 8}' y='{y + BH / 2 + 4}' font-size='12' text-anchor='end'>{_esc(label)}</text>"
        )
        # horizontal bar: data end (right) rounded, baseline (left) square
        r = 2
        out.append(
            f"<path class='series' d='M{ML},{y} h{w - r:.2f} q{r},0 {r},{r} "
            f"v{BH - 2 * r} q0,{r} {-r},{r} h{-(w - r):.2f} z'>"
            f"<title>{_esc(name)}: {v}</title></path>"
        )
        out.append(
            f"<text class='ink2' x='{ML + w + 6:.1f}' y='{y + BH / 2 + 4}' font-size='12'>{v}</text>"
        )
    out.append(
        f"<text class='ink2' x='{ML + pw / 2}' y='{H - 4}' font-size='12' text-anchor='middle'>{_esc(xlabel)}</text>"
    )
    out.append("</svg>")
    return "".join(out)


# -- the three figures, reduced in Spark -------------------------------------

def build_all(spark, sf_dir: str, out_dir: str, n_bins: int = 50) -> dict:
    from pyspark.sql import functions as F

    from anomalydetection_spark.operators import pca

    os.makedirs(out_dir, exist_ok=True)
    written = {}

    # 1. anomaly score distribution (ref end_to_end_prediction.py:545-553):
    #    PCA reconstruction-error scores, binned IN Spark, exact q95 line
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca.fit_pca(em, "embedding", k=8)
    scores = pca.reconstruction_scores(em, "vec_id", "embedding", model)
    rng = scores.agg(
        F.min("score").alias("lo"), F.max("score").alias("hi"),
        F.expr("percentile(score, 0.95)").alias("q95"),
    ).first()
    lo, hi, q95 = rng["lo"], rng["hi"], rng["q95"]
    w = (hi - lo) / n_bins or 1.0
    bucket = F.least(F.floor((F.col("score") - F.lit(lo)) / F.lit(w)),
                     F.lit(n_bins - 1)).cast("int")
    counts = {
        r["b"]: r["n"]
        for r in scores.groupBy(bucket.alias("b")).agg(F.count("*").alias("n")).collect()
    }
    bins = [(lo + i * w, lo + (i + 1) * w, counts.get(i, 0)) for i in range(n_bins)]
    p = os.path.join(out_dir, "anomaly_score_distribution.svg")
    open(p, "w").write(svg_histogram(
        bins, q95, "Distribution of anomaly scores", "PCA reconstruction error"))
    written["anomaly_score_distribution"] = p

    # 2. confusion matrix (ref :566-584): the binary matrix the reference
    #    plots — stored label binarized the way eval_metrics_embeddings
    #    scores it (label==1 is the positive class), prediction from the
    #    q95-threshold L2-norm score (confusion_matrix_embeddings core)
    score = F.sqrt(F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    scored = em.select("label", score.alias("s"))
    th2 = scored.agg(F.expr("percentile(s, 0.95)").alias("t"))
    name = lambda c: F.when(c, F.lit("anomaly")).otherwise(F.lit("normal"))
    cm = {
        (r["t"], r["p"]): r["n"]
        for r in scored.crossJoin(F.broadcast(th2))
        .select(name(F.col("label") == 1).alias("t"),
                name(F.col("s") > F.col("t")).alias("p"))
        .groupBy("t", "p").agg(F.count("*").alias("n")).collect()
    }
    p = os.path.join(out_dir, "confusion_matrix.svg")
    open(p, "w").write(svg_heatmap(cm, "Confusion matrix"))
    written["confusion_matrix"] = p

    # 3. top templates among anomalies (ref :594-601): events above the
    #    exact q95 |value|, rendered as log lines (the template_merge
    #    renderer: 5 event types x 3 regions), digit-masked, Spark top-10
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    th = ev.agg(F.expr("percentile(abs(value), 0.95)").alias("t")).first()["t"]
    region = F.element_at(
        F.array(F.lit("us"), F.lit("eu"), F.lit("ap")),
        (F.pmod("user_id", F.lit(3)) + 1).cast("int"),
    )
    msg = F.concat_ws(
        " ", F.lit("evt"), "event_type", F.lit("region"), region,
        F.lit("took"), F.floor("value").cast("long").cast("string"), F.lit("ms"),
    )
    top = (
        ev.filter(F.abs("value") > F.lit(th))
        .select(F.regexp_replace(msg, r"\d+", "<*>").alias("template"))
        .groupBy("template").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "template").limit(10).collect()
    )
    p = os.path.join(out_dir, "anomaly_templates.svg")
    open(p, "w").write(svg_hbar(
        [(r["template"], r["n"]) for r in top],
        "Most common templates in anomalies", "anomalous events"))
    written["anomaly_templates"] = p
    return written


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "results"))
    ap.add_argument("--bins", type=int, default=50)
    a = ap.parse_args()
    from anomalydetection_spark.session import get_spark

    spark = get_spark(master="local[8]")
    for name, path in build_all(spark, a.sf_dir, a.out, a.bins).items():
        print(f"{name}: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
