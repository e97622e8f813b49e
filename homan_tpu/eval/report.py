"""Experiment reporting: metric aggregation + a static HTML browser.

Replaces the bokeh/pandas/dominate stack of the reference
(homan/eval/saveresults.py, logutils.py, analyze.py, htmlgrid.py) with
dependency-free inline-SVG loss curves and plain HTML tables.
"""
from __future__ import annotations

import html
import os
import pickle
from typing import Dict, List, Sequence

import numpy as np


def dump(opts: Dict, all_metrics: Dict[str, List], save_path: str):
    """Accumulated results pickle (homan/eval/saveresults.py:7-16)."""
    payload = {"opts": dict(opts), "metrics": {k: list(v) for k, v in
                                               all_metrics.items()}}
    with open(save_path, "wb") as f:
        pickle.dump(payload, f)
    return payload


def _svg_curve(values: Sequence[float], width=320, height=90,
               color="#2266cc") -> str:
    vals = np.asarray(values, np.float64)
    vals = vals[np.isfinite(vals)]
    if len(vals) < 2:
        return "<svg/>"
    lo, hi = float(vals.min()), float(vals.max())
    span = (hi - lo) or 1.0
    xs = np.linspace(4, width - 4, len(vals))
    ys = height - 4 - (vals - lo) / span * (height - 8)
    pts = " ".join(f"{x:.1f},{y:.1f}" for x, y in zip(xs, ys))
    return (f'<svg width="{width}" height="{height}">'
            f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{pts}"/>'
            f'<text x="4" y="12" font-size="10">{hi:.4g}</text>'
            f'<text x="4" y="{height - 2}" font-size="10">{lo:.4g}</text>'
            f"</svg>")


def metrics_table(metrics: Dict[str, Sequence[float]]) -> str:
    rows = []
    for key in sorted(metrics):
        vals = np.asarray(
            [v for v in np.ravel(metrics[key]) if isinstance(
                v, (int, float, np.floating, np.integer))], np.float64)
        if len(vals) == 0:
            continue
        rows.append(
            f"<tr><td>{html.escape(key)}</td>"
            f"<td>{np.nanmean(vals):.5g}</td><td>{np.nanmedian(vals):.5g}</td>"
            f"<td>{np.nanstd(vals):.3g}</td><td>{len(vals)}</td></tr>")
    return ("<table border=1 cellspacing=0 cellpadding=4>"
            "<tr><th>metric</th><th>mean</th><th>median</th>"
            "<th>std</th><th>n</th></tr>" + "".join(rows) + "</table>")


def make_exp_html(result_root: str, out_path: str | None = None) -> str:
    """Walk samples/*/results.pkl into one HTML report
    (homan/eval/analyze.py:12-115 + logutils.py role)."""
    out_path = out_path or os.path.join(result_root, "report.html")
    samples_dir = os.path.join(result_root, "samples")
    sections = []
    agg: Dict[str, List[float]] = {}
    if os.path.isdir(samples_dir):
        for name in sorted(os.listdir(samples_dir)):
            res_path = os.path.join(samples_dir, name, "results.pkl")
            if not os.path.exists(res_path):
                continue
            with open(res_path, "rb") as f:
                res = pickle.load(f)
            curves = ""
            for key, series in sorted(res.get("losses", {}).items()):
                series = np.ravel(series)
                if len(series) > 1:
                    curves += (f"<div style='display:inline-block;margin:4px'>"
                               f"<div>{html.escape(key)}</div>"
                               f"{_svg_curve(series)}</div>")
            imgs = ""
            for img in ("final_points.png", "detections_masks.png"):
                if os.path.exists(os.path.join(samples_dir, name, img)):
                    imgs += f'<img src="samples/{name}/{img}" height="160"/>'
            for k, v in res.get("metrics", {}).items():
                agg.setdefault(k, []).extend(
                    v if isinstance(v, list) else [v])
            sections.append(f"<h3>sample {name}</h3>{imgs}{curves}"
                            f"{metrics_table(res.get('metrics', {}))}")
    doc = ("<html><head><title>homan_tpu results</title></head><body>"
           f"<h1>{html.escape(result_root)}</h1>"
           "<h2>Aggregate</h2>" + metrics_table(agg)
           + "".join(sections) + "</body></html>")
    with open(out_path, "w") as f:
        f.write(doc)
    return out_path


def html_grid(rows: Dict[str, List[str]], out_path: str,
              title: str = "grid") -> str:
    """Simple media grid (homan/htmlgrid.py:29-57 role): label -> media paths."""
    body = ""
    for label, paths in rows.items():
        cells = ""
        for p in paths:
            if p.endswith((".mp4", ".webm")):
                cells += (f'<td><video src="{html.escape(p)}" height="140" '
                          'controls loop autoplay muted/></td>')
            else:
                cells += f'<td><img src="{html.escape(p)}" height="140"/></td>'
        body += f"<tr><td>{html.escape(label)}</td>{cells}</tr>"
    doc = (f"<html><head><title>{html.escape(title)}</title></head><body>"
           f"<table>{body}</table></body></html>")
    with open(out_path, "w") as f:
        f.write(doc)
    return out_path
