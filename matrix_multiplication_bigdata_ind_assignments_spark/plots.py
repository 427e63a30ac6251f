"""Dependency-free PNG chart rendering for the ``analyze`` CLI.

The reference renders its benchmark reports as matplotlib PNGs
(`Stage 1/Visualization/mm_perf_visualizer.py:51-102`,
`Stage 3/Visualization/mm_perf_parallel_visualizer.py:77-148`).  This
container has no matplotlib, so this module rasterizes the same plot set
with numpy and writes PNGs via stdlib zlib — deterministic, testable, no
optional dependency.

Design rules applied (and worth keeping on edits):
- line chart per series where the series entity is (lang, algo); colors
  are a CVD-validated categorical palette assigned in FIXED sorted-entity
  order, never cycled, and never re-assigned when series are filtered;
- at most 8 series get hues — extras are dropped LOUDLY (printed), never
  silently;
- legend for >= 2 series; single series charts carry the name in the
  title instead;
- recessive grid/axes: grid lighter than data ink, labels in secondary
  text color, marks 2 px lines + 8 px markers.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

# Validated categorical palette (light mode) + surface/text tokens.
SURFACE = (0xFC, 0xFC, 0xFB)
GRID = (0xE4, 0xE3, 0xDF)
AXIS = (0x9A, 0x99, 0x94)
TEXT = (0x0B, 0x0B, 0x0B)
TEXT_2 = (0x52, 0x51, 0x4E)
PALETTE = (
    (0x2A, 0x78, 0xD6),  # blue
    (0xEB, 0x68, 0x34),  # orange
    (0x1B, 0xAF, 0x7A),  # aqua
    (0xED, 0xA1, 0x00),  # yellow
    (0xE8, 0x7B, 0xA4),  # magenta
    (0x00, 0x83, 0x00),  # green
    (0x4A, 0x3A, 0xA7),  # violet
    (0xE3, 0x49, 0x48),  # red
)

# 5x7 bitmap glyphs (row-major, 5-bit rows).  Uppercase-only: lowercase
# input is upcased before lookup.
_GLYPHS: dict[str, tuple[int, ...]] = {
    " ": (0, 0, 0, 0, 0, 0, 0),
    "-": (0, 0, 0, 0b11111, 0, 0, 0),
    "+": (0, 0b00100, 0b00100, 0b11111, 0b00100, 0b00100, 0),
    ".": (0, 0, 0, 0, 0, 0b00110, 0b00110),
    ",": (0, 0, 0, 0, 0b00110, 0b00100, 0b01000),
    "/": (0b00001, 0b00010, 0b00010, 0b00100, 0b01000, 0b01000, 0b10000),
    "(": (0b00010, 0b00100, 0b01000, 0b01000, 0b01000, 0b00100, 0b00010),
    ")": (0b01000, 0b00100, 0b00010, 0b00010, 0b00010, 0b00100, 0b01000),
    "=": (0, 0, 0b11111, 0, 0b11111, 0, 0),
    ":": (0, 0b00110, 0b00110, 0, 0b00110, 0b00110, 0),
    "_": (0, 0, 0, 0, 0, 0, 0b11111),
    "%": (0b11001, 0b11010, 0b00010, 0b00100, 0b01000, 0b01011, 0b10011),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
    "A": (0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "B": (0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110),
    "C": (0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110),
    "D": (0b11100, 0b10010, 0b10001, 0b10001, 0b10001, 0b10010, 0b11100),
    "E": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b11111),
    "F": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000),
    "G": (0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111),
    "H": (0b10001, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "I": (0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "J": (0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100),
    "K": (0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001),
    "L": (0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111),
    "M": (0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001),
    "N": (0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001, 0b10001),
    "O": (0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "Q": (0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101),
    "R": (0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "T": (0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "U": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "V": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b10101, 0b01010),
    "X": (0b10001, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001, 0b10001),
    "Y": (0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100, 0b00100),
    "Z": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111),
}


def write_png(path: str, rgb: np.ndarray) -> None:
    """Encode an (H, W, 3) uint8 array as a truecolor PNG."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def _fill(img: np.ndarray, y0: int, y1: int, x0: int, x1: int, col) -> None:
    """Clipped rectangle fill — negative coordinates are clipped, never
    allowed to wrap around as negative slice indices."""
    h, w, _ = img.shape
    ya, yb = max(y0, 0), min(y1, h)
    xa, xb = max(x0, 0), min(x1, w)
    if yb > ya and xb > xa:
        img[ya:yb, xa:xb] = col


def _text(img: np.ndarray, x: int, y: int, s: str, color, scale: int = 2) -> int:
    """Render ``s`` at (x, y) top-left; returns the x after the last glyph."""
    col = np.array(color, dtype=np.uint8)
    for ch in str(s).upper():
        rows = _GLYPHS.get(ch, _GLYPHS[" "])
        for ry, bits in enumerate(rows):
            for rx in range(5):
                if bits & (1 << (4 - rx)):
                    y0, x0 = y + ry * scale, x + rx * scale
                    _fill(img, y0, y0 + scale, x0, x0 + scale, col)
        x += 6 * scale
    return x


def _text_w(s: str, scale: int = 2) -> int:
    return 6 * scale * len(str(s))


def _line(img: np.ndarray, x0: float, y0: float, x1: float, y1: float, color, width: int = 2) -> None:
    col = np.array(color, dtype=np.uint8)
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) + 1
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    r = width // 2
    for x, y in zip(xs, ys):
        xi, yi = int(round(x)), int(round(y))
        _fill(img, yi - r, yi + width - r, xi - r, xi + width - r, col)


def _marker(img: np.ndarray, x: float, y: float, color, size: int = 8) -> None:
    h, w, _ = img.shape
    col = np.array(color, dtype=np.uint8)
    r = size // 2
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (xx * xx + yy * yy) <= r * r
    for dy, dx in zip(*np.nonzero(mask)):
        yi, xi = int(round(y)) + dy - r, int(round(x)) + dx - r
        if 0 <= yi < h and 0 <= xi < w:
            img[yi, xi] = col


def _nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    if hi <= lo:
        return [lo]
    step = 10 ** math.floor(math.log10((hi - lo) / max(n, 1)))
    for mult in (1, 2, 5, 10):
        if (hi - lo) / (step * mult) <= n:
            step *= mult
            break
    start = math.ceil(lo / step) * step
    out = []
    t = start
    while t <= hi + step * 1e-9:
        out.append(round(t, 10))
        t += step
    return out or [lo]


def _fmt(v: float) -> str:
    if v == 0:
        return "0"
    if abs(v) >= 10000 or abs(v) < 0.01:
        return f"{v:.0e}".replace("e+0", "e").replace("e-0", "e-").replace("e+", "e")
    return f"{v:g}"


def line_chart(
    path: str,
    series: list[tuple[str, list[float], list[float]]],
    title: str,
    xlabel: str,
    ylabel: str,
    xscale: str = "linear",
    yscale: str = "linear",
    width: int = 880,
    height: int = 620,
) -> None:
    """Render a multi-series line chart to a PNG.

    ``series`` is [(label, xs, ys), ...] — colors are assigned by sorted
    label, fixed per entity.  Scales: "linear" or "log".
    """
    img = np.empty((height, width, 3), dtype=np.uint8)
    img[:] = SURFACE
    ml, mr, mt, mb = 84, 24, 44, 64
    px0, px1 = ml, width - mr
    py0, py1 = height - mb, mt  # y grows downward

    series = sorted(series, key=lambda s: s[0])
    if len(series) > len(PALETTE):
        dropped = [s[0] for s in series[len(PALETTE) :]]
        print(f"(plot {path}: >8 series; dropped {dropped} — facet or fold instead)")
        series = series[: len(PALETTE)]

    allx = [x for _, xs, _ in series for x in xs]
    ally = [y for _, _, ys in series for y in ys if y is not None]
    if not allx or not ally:
        write_png(path, img)
        return

    def make_scale(vals, kind, p_lo, p_hi):
        if kind == "log" and not any(v > 0 for v in vals):
            kind = "linear"  # all-zero/negative data can't plot on a log axis
        if kind == "log":
            vals = [v for v in vals if v > 0]
            lo, hi = math.log10(min(vals)), math.log10(max(vals))
            if hi - lo < 1e-9:
                lo, hi = lo - 0.5, hi + 0.5
            ticks = [
                m * 10.0**e
                for e in range(math.floor(lo), math.floor(hi) + 1)
                for m in (1, 2, 5)
                if lo - 1e-9 <= math.log10(m) + e <= hi + 1e-9
            ]
            # wide spans: decades alone are enough ticks
            if hi - lo >= 2:
                ticks = [t for t in ticks if abs(math.log10(t) % 1) < 1e-9]

            def to_px(v):
                return p_lo + (math.log10(v) - lo) / (hi - lo) * (p_hi - p_lo)

        else:
            lo, hi = min(vals), max(vals)
            if hi - lo < 1e-9:
                lo, hi = lo - 1, hi + 1
            ticks = _nice_ticks(lo, hi)
            lo, hi = min(lo, ticks[0]), max(hi, ticks[-1])

            def to_px(v):
                return p_lo + (v - lo) / (hi - lo) * (p_hi - p_lo)

        return to_px, [t for t in ticks if True]

    x_px, x_ticks = make_scale(allx, xscale, px0, px1)
    y_px, y_ticks = make_scale(ally, yscale, py0, py1)

    # grid + tick labels (recessive: grid < axis < ink); ticks outside
    # the plot rectangle are dropped, not drawn clipped
    for t in x_ticks:
        gx = x_px(t)
        if not (px0 - 1 <= gx <= px1 + 1):
            continue
        _line(img, gx, py1, gx, py0, GRID, 1)
        lbl = _fmt(t)
        _text(img, int(gx) - _text_w(lbl) // 2, py0 + 8, lbl, TEXT_2)
    for t in y_ticks:
        gy = y_px(t)
        if not (py1 - 1 <= gy <= py0 + 1):
            continue
        _line(img, px0, gy, px1, gy, GRID, 1)
        lbl = _fmt(t)
        _text(img, px0 - 8 - _text_w(lbl), int(gy) - 7, lbl, TEXT_2)
    # axes
    _line(img, px0, py0, px1, py0, AXIS, 2)
    _line(img, px0, py0, px0, py1, AXIS, 2)
    # title + axis labels
    _text(img, (width - _text_w(title)) // 2, 12, title, TEXT)
    _text(img, (width - _text_w(xlabel)) // 2, height - 24, xlabel, TEXT_2)
    _text(img, 8, py1 - 28, ylabel, TEXT_2)

    # data marks: 2 px lines, 8 px markers, hue fixed by sorted entity order
    for idx, (label, xs, ys) in enumerate(series):
        color = PALETTE[idx]
        pts = sorted(
            (
                (x, y)
                for x, y in zip(xs, ys)
                if y is not None
                and (xscale != "log" or x > 0)
                and (yscale != "log" or y > 0)
            ),
        )
        px = [(x_px(x), y_px(y)) for x, y in pts]
        for (ax, ay), (bx, by) in zip(px, px[1:]):
            _line(img, ax, ay, bx, by, color, 2)
        for cx, cy in px:
            _marker(img, cx, cy, color, 8)

    # legend (>= 2 series): swatch + label on a surface patch so data
    # marks underneath can't collide with the text
    if len(series) >= 2:
        lw = max(_text_w(s[0]) for s in series) + 36
        lx = px1 - 8 - lw
        ly = py1 + 8
        _fill(img, ly - 4, ly + 20 * len(series) + 2, lx - 4, lx + lw, np.array(SURFACE, dtype=np.uint8))
        for idx, (label, _, _) in enumerate(series):
            _marker(img, lx + 6, ly + 7, PALETTE[idx], 8)
            _text(img, lx + 20, ly, label, TEXT)
            ly += 20

    write_png(path, img)


def render_report(pdf, out_dir: str) -> list[str]:
    """Write the reference visualizer's PNG set from the derived-metrics
    frame (pandas; tiny — one row per (lang, algo, size, threads)).

    Mirrors `Stage 1/Visualization/mm_perf_visualizer.py:51-102` (time and
    memory log-log vs size) and
    `Stage 3/Visualization/mm_perf_parallel_visualizer.py:77-148`
    (per-size speedup / efficiency / time vs threads, emitted only when
    the corpus actually has a thread sweep)."""
    written: list[str] = []

    def by_series(frame, ycol, agg):
        # one point per (series, size): a thread sweep contributes its best
        # time / peak memory, matching the reference's one-row-per-size CSVs.
        # When (lang, algo) overflows the 8-hue palette, fold to lang-only
        # series — the reference's Plot 1 grouping — instead of dropping.
        keys = ["lang", "algo"]
        if frame.groupby(keys).ngroups > len(PALETTE):
            keys = ["lang"]
        out = []
        for key, g in frame.groupby(keys):
            g = g.groupby("size", as_index=False).agg({ycol: agg}).sort_values("size")
            label = "/".join(key) if isinstance(key, tuple) else key
            out.append((label, list(g["size"]), list(g[ycol])))
        return out

    p = f"{out_dir}/mm_perf_time.png"
    line_chart(
        p, by_series(pdf, "avg_time_ms", "min"),
        "Execution time vs matrix size", "matrix size (n)", "avg time (ms)",
        xscale="log", yscale="log",
    )
    written.append(p)

    if pdf["rss_mb"].notna().any():
        p = f"{out_dir}/mm_perf_memory.png"
        line_chart(
            p, by_series(pdf[pdf["rss_mb"].notna()], "rss_mb", "max"),
            "Peak memory vs matrix size", "matrix size (n)", "peak rss (mb)",
            xscale="log", yscale="log",
        )
        written.append(p)

    if pdf["threads"].nunique() > 1:
        for n in sorted(pdf["size"].unique()):
            sub = pdf[pdf["size"] == n]
            for ycol, stem, ylab, ysc in (
                ("speedup", "parallel_speedup", "speedup (t1/tp)", "linear"),
                ("efficiency", "parallel_efficiency", "efficiency (speedup/p)", "linear"),
                ("avg_time_ms", "parallel_time", "time (ms)", "log"),
            ):
                keys = ["lang", "algo"]
                if sub.groupby(keys).ngroups > len(PALETTE):
                    keys = ["lang"]  # fold to lang-only (reference grouping)
                rows = []
                for key, g in sub.groupby(keys):
                    g = g.groupby("threads", as_index=False).agg({ycol: "min"}).sort_values("threads")
                    label = "/".join(key) if isinstance(key, tuple) else key
                    rows.append((label, list(g["threads"]), list(g[ycol])))
                p = f"{out_dir}/{stem}_{n}.png"
                line_chart(
                    p, rows, f"{stem.split('_')[1]} vs threads (n={n})",
                    "threads (p)", ylab, xscale="linear", yscale=ysc,
                )
                written.append(p)
    return written
