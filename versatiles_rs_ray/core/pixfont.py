"""Tiny built-in 5x7 pixel font for debug-tile rendering.

The reference renders debug tiles through a bundled TTF
(from_debug/trim.ttf + ab_glyph). A TTF rasterizer is out of scope, so
this module provides the same SEMANTIC surface — draw "z: 4" onto a
raster, or outline it as tile-space polygons — with a built-in bitmap
font. Glyph shapes therefore differ from the reference pixel-for-pixel
while every layout/color/structure constant matches
(from_debug/image.rs:13-34, vector.rs:17-77).
"""

from __future__ import annotations

import numpy as np

# 5 columns x 7 rows per glyph, row-major strings ('#' = lit)
_GLYPHS = {
    "0": ["#####", "#...#", "#..##", "#.#.#", "##..#", "#...#", "#####"],
    "1": ["..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."],
    "2": ["#####", "....#", "....#", "#####", "#....", "#....", "#####"],
    "3": ["#####", "....#", "....#", ".####", "....#", "....#", "#####"],
    "4": ["#...#", "#...#", "#...#", "#####", "....#", "....#", "....#"],
    "5": ["#####", "#....", "#....", "#####", "....#", "....#", "#####"],
    "6": ["#####", "#....", "#....", "#####", "#...#", "#...#", "#####"],
    "7": ["#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."],
    "8": ["#####", "#...#", "#...#", "#####", "#...#", "#...#", "#####"],
    "9": ["#####", "#...#", "#...#", "#####", "....#", "....#", "#####"],
    "x": [".....", ".....", "#...#", ".#.#.", "..#..", ".#.#.", "#...#"],
    "y": [".....", ".....", "#...#", ".#.#.", "..#..", "..#..", "..#.."],
    "z": [".....", ".....", "#####", "...#.", "..#..", ".#...", "#####"],
    ":": [".....", "..#..", "..#..", ".....", "..#..", "..#..", "....."],
    " ": [".....", ".....", ".....", ".....", ".....", ".....", "....."],
    "-": [".....", ".....", ".....", "#####", ".....", ".....", "....."],
}
GLYPH_W, GLYPH_H = 5, 7
ADVANCE = 6  # columns per char incl. 1 spacing column


def glyph_mask(ch: str) -> np.ndarray:
    """(7, 5) bool mask for one character (blank for unknown)."""
    rows = _GLYPHS.get(ch, _GLYPHS[" "])
    return np.array([[c == "#" for c in r] for r in rows], dtype=bool)


def draw_text(img: np.ndarray, x: int, y: int, text: str, color, px: int = 5):
    """Render `text` onto an (H, W, C) uint8 image at top-left (x, y),
    each font pixel drawn as a px*px square. Clips at image bounds."""
    h, w = img.shape[:2]
    color = np.asarray(color, dtype=np.uint8)
    cx = x
    for ch in text:
        m = glyph_mask(ch)
        for r, c in zip(*np.nonzero(m)):
            y0, x0 = y + int(r) * px, cx + int(c) * px
            y1, x1 = min(y0 + px, h), min(x0 + px, w)
            if y0 < h and x0 < w and y1 > 0 and x1 > 0:
                img[max(y0, 0):y1, max(x0, 0):x1, : len(color)] = color
        cx += ADVANCE * px
    return img


def text_polygons(text: str, origin_x: float, origin_y: float, px: float):
    """`text` as per-char lists of square polygons in tile coordinates
    (the vector analogue of draw_text: one (char, char_x, polygons)
    tuple per character; each polygon a closed ring of (x, y))."""
    out = []
    cx = origin_x
    for ch in text:
        m = glyph_mask(ch)
        polys = []
        for r, c in zip(*np.nonzero(m)):
            x0, y0 = cx + int(c) * px, origin_y + int(r) * px
            polys.append([(x0, y0), (x0 + px, y0), (x0 + px, y0 + px),
                          (x0, y0 + px), (x0, y0)])
        out.append((ch, cx, polys))
        cx += ADVANCE * px
    return out
