"""Dependency-free SVG rendering backend for the presentation layer
(SURVEY §2.13).

The reference renders with matplotlib (plot.py:376-518, 552-617, 858-907).
This container intentionally ships no plotting library, so the engine's
presentation layer separates *figure data preparation* (Spark-side, in
``viz.py``) from *rendering* (here): a tiny SVG writer covering exactly the
mark types the reference uses — line series, shaded range ribbons, split
coloring, horizontal bar charts, histogram grids, reference lines.  The
output is a standalone ``.svg`` file viewable in any browser; swapping in a
matplotlib backend is a rendering concern only and touches none of the
engine code.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from html import escape

#: matplotlib's default ("tab10") hues, so figures read like the reference's
PALETTE = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
]
#: reference DEFAULT_COLORS (plot.py:27-30): labels green, predictions red
COLOR_LABELS = "#2ca02c"
COLOR_PREDICTIONS = "#d62728"


@dataclass
class Series:
    label: str
    xs: list[float]
    ys: list[float]
    color: str = PALETTE[0]


@dataclass
class Band:
    """A shaded vertical span (label/prediction ribbon, plot.py:493-518)."""

    x0: float
    x1: float
    color: str
    label: str = ""


@dataclass
class Panel:
    title: str = ""
    series: list[Series] = field(default_factory=list)
    bands: list[Band] = field(default_factory=list)
    hlines: list[float] = field(default_factory=list)
    height_ratio: float = 1.0


def _finite(v) -> bool:
    return v is not None and not (isinstance(v, float) and math.isnan(v))


def _bounds(panels: list[Panel]) -> tuple[float, float, float, float]:
    xs, ys = [], []
    for p in panels:
        for s in p.series:
            xs.extend(x for x in s.xs if _finite(x))
            ys.extend(y for y in s.ys if _finite(y))
        for b in p.bands:
            xs.extend([b.x0, b.x1])
        ys.extend(p.hlines)
    if not xs:
        xs = [0.0, 1.0]
    if not ys:
        ys = [0.0, 1.0]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    if x0 == x1:
        x0, x1 = x0 - 0.5, x1 + 0.5
    if y0 == y1:
        y0, y1 = y0 - 0.5, y1 + 0.5
    return x0, x1, y0, y1


def render_figure(
    path: str,
    panels: list[Panel],
    width_px: int = 900,
    panel_height_px: int = 200,
    shared_x: bool = True,
) -> None:
    """Multi-panel time-series figure: one row per panel, shared x-axis
    (the reference stacks signal/label/prediction rows with gridspec
    height_ratios, plot.py:376-454)."""
    margin = 50
    total_ratio = sum(p.height_ratio for p in panels) or 1.0
    heights = [
        max(30, int(panel_height_px * p.height_ratio)) for p in panels
    ]
    height_px = sum(heights) + margin * (len(panels) + 1)
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width_px}" '
        f'height="{height_px}" font-family="sans-serif" font-size="11">'
    ]
    gx0, gx1, _, _ = _bounds(panels)
    y_cursor = margin
    for p, h in zip(panels, heights):
        if shared_x:
            x0, x1 = gx0, gx1
            _, _, y0, y1 = _bounds([p])
        else:
            x0, x1, y0, y1 = _bounds([p])

        def sx(v, x0=x0, x1=x1):
            return margin + (v - x0) / (x1 - x0) * (width_px - 2 * margin)

        def sy(v, y0=y0, y1=y1, top=y_cursor, h=h):
            return top + h - (v - y0) / (y1 - y0) * h

        out.append(
            f'<rect x="{margin}" y="{y_cursor}" '
            f'width="{width_px - 2 * margin}" height="{h}" '
            'fill="none" stroke="#cccccc"/>'
        )
        if p.title:
            out.append(
                f'<text x="{margin}" y="{y_cursor - 6}" font-weight="bold">'
                f"{escape(p.title)}</text>"
            )
        for b in p.bands:
            bx0, bx1 = sorted((sx(b.x0), sx(b.x1)))
            out.append(
                f'<rect x="{bx0:.1f}" y="{y_cursor}" '
                f'width="{max(bx1 - bx0, 1.0):.1f}" height="{h}" '
                f'fill="{b.color}" fill-opacity="0.35"'
                + (f'><title>{escape(b.label)}</title></rect>' if b.label else "/>")
            )
        for hl in p.hlines:
            out.append(
                f'<line x1="{margin}" x2="{width_px - margin}" '
                f'y1="{sy(hl):.1f}" y2="{sy(hl):.1f}" '
                'stroke="#888888" stroke-dasharray="4 3"/>'
            )
        for s in p.series:
            seg: list[str] = []
            for x, y in zip(s.xs, s.ys):
                if _finite(x) and _finite(y):
                    seg.append(f"{sx(x):.1f},{sy(y):.1f}")
                elif seg:  # null breaks the line, like matplotlib NaN gaps
                    out.append(_polyline(seg, s.color))
                    seg = []
            if seg:
                out.append(_polyline(seg, s.color))
        # legend: stacked top-left inside the panel
        for i, s in enumerate(p.series):
            ly = y_cursor + 14 + i * 14
            out.append(
                f'<line x1="{margin + 6}" x2="{margin + 26}" y1="{ly}" '
                f'y2="{ly}" stroke="{s.color}" stroke-width="2"/>'
            )
            out.append(
                f'<text x="{margin + 30}" y="{ly + 4}">{escape(s.label)}</text>'
            )
        # x-axis tick labels (ends only — enough for inspection)
        out.append(
            f'<text x="{margin}" y="{y_cursor + h + 14}">{_fmt_x(x0)}</text>'
        )
        out.append(
            f'<text x="{width_px - margin}" y="{y_cursor + h + 14}" '
            f'text-anchor="end">{_fmt_x(x1)}</text>'
        )
        y_cursor += h + margin
    out.append("</svg>")
    with open(path, "w") as f:
        f.write("\n".join(out))


def _polyline(points: list[str], color: str) -> str:
    if len(points) == 1:
        x, y = points[0].split(",")
        return f'<circle cx="{x}" cy="{y}" r="1.5" fill="{color}"/>'
    return (
        f'<polyline points="{" ".join(points)}" fill="none" '
        f'stroke="{color}" stroke-width="1.2"/>'
    )


def _fmt_x(v: float) -> str:
    """Epoch-second x values render as timestamps, everything else as-is."""
    if 1e8 < v < 5e9:
        from datetime import datetime, timezone

        return datetime.fromtimestamp(v, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M"
        )
    return f"{v:g}"


def render_barh(
    path: str,
    labels: list[str],
    values: list[float],
    ref_line: float | None = None,
    title: str = "",
    width_px: int = 700,
    bar_height_px: int = 22,
    color: str = PALETTE[0],
) -> None:
    """Horizontal bar chart (feature-importance, plot.py:858-907); optional
    dashed vertical reference line (1/num_features, plot.py:902-903)."""
    margin_l, margin_r, margin_t = 180, 40, 40
    h = margin_t + bar_height_px * len(labels) + 30
    vmax = max([abs(v) for v in values] + [ref_line or 0.0]) or 1.0
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width_px}" '
        f'height="{h}" font-family="sans-serif" font-size="11">'
    ]
    if title:
        out.append(
            f'<text x="{margin_l}" y="20" font-weight="bold">'
            f"{escape(title)}</text>"
        )

    def sx(v):
        return margin_l + v / vmax * (width_px - margin_l - margin_r)

    for i, (lab, val) in enumerate(zip(labels, values)):
        y = margin_t + i * bar_height_px
        out.append(
            f'<rect x="{margin_l}" y="{y}" width="{max(sx(val) - margin_l, 0):.1f}" '
            f'height="{bar_height_px - 4}" fill="{color}"/>'
        )
        out.append(
            f'<text x="{margin_l - 6}" y="{y + bar_height_px - 9}" '
            f'text-anchor="end">{escape(str(lab))}</text>'
        )
        out.append(
            f'<text x="{sx(val) + 4:.1f}" y="{y + bar_height_px - 9}">'
            f"{val:.4f}</text>"
        )
    if ref_line is not None:
        out.append(
            f'<line x1="{sx(ref_line):.1f}" x2="{sx(ref_line):.1f}" '
            f'y1="{margin_t - 6}" y2="{h - 24}" stroke="#d62728" '
            'stroke-dasharray="5 3"/>'
        )
    out.append("</svg>")
    with open(path, "w") as f:
        f.write("\n".join(out))


def render_histogram_grid(
    path: str,
    cells: list[tuple[str, list[tuple[str, list[float], float, list[float], str]]]],
    ncols: int = 3,
    cell_w: int = 280,
    cell_h: int = 180,
) -> None:
    """Grid of per-signal overlaid histograms (evaluation.py:394-478,
    plot.py:552-617).  ``cells`` = [(title, [(label, bin_starts, bin_width,
    densities, color), ...]), ...]; subsets overlay semi-transparently like
    the reference's alpha-blended training/evaluation pairs."""
    nrows = math.ceil(len(cells) / ncols) or 1
    margin = 36
    W = ncols * (cell_w + margin) + margin
    H = nrows * (cell_h + margin + 20) + margin
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        'font-family="sans-serif" font-size="11">'
    ]
    for idx, (title, hists) in enumerate(cells):
        r, c = divmod(idx, ncols)
        ox = margin + c * (cell_w + margin)
        oy = margin + 20 + r * (cell_h + margin + 20)
        xs = [b for _, starts, w, _, _ in hists for b in (starts[0], starts[-1] + w)]
        dmax = max((d for _, _, _, dens, _ in hists for d in dens), default=1.0) or 1.0
        x0, x1 = (min(xs), max(xs)) if xs else (0.0, 1.0)
        if x0 == x1:
            x0, x1 = x0 - 0.5, x1 + 0.5
        out.append(
            f'<text x="{ox}" y="{oy - 6}" font-weight="bold">'
            f"{escape(title)}</text>"
        )
        out.append(
            f'<rect x="{ox}" y="{oy}" width="{cell_w}" height="{cell_h}" '
            'fill="none" stroke="#cccccc"/>'
        )
        for label, starts, w, dens, color in hists:
            for b0, d in zip(starts, dens):
                if not _finite(d) or d <= 0:
                    continue
                bx = ox + (b0 - x0) / (x1 - x0) * cell_w
                bw = w / (x1 - x0) * cell_w
                bh = d / dmax * (cell_h - 6)
                out.append(
                    f'<rect x="{bx:.1f}" y="{oy + cell_h - bh:.1f}" '
                    f'width="{max(bw, 0.5):.1f}" height="{bh:.1f}" '
                    f'fill="{color}" fill-opacity="0.5"'
                    f'><title>{escape(label)}</title></rect>'
                )
    out.append("</svg>")
    with open(path, "w") as f:
        f.write("\n".join(out))
