"""Pure-Python TrueType font parsing + rasterization.

Honors the freetype module's actual contract (the reference renders
arbitrary TTF/OTF via FreeType+HarfBuzz: freetype/src/freetype.cpp
loadFontData/putText): parses the sfnt tables head/maxp/cmap(format 4)/
loca/glyf/hhea/hmtx and the optional kern(format 0) pair table, expands
quadratic outlines (with implied on-curve midpoints and composite glyph
resolution), and rasterizes by supersampled non-zero-winding scanline
fill. No FreeType linkage — the parser IS the font backend.

All formats per the OpenType/TrueType specification (public standard).
"""

from __future__ import annotations

import struct
from typing import Dict, NamedTuple

import numpy as np


class Glyph(NamedTuple):
    contours: list  # list of (N, 2) float arrays, font units, y-up
    advance: int  # font units
    lsb: int


class TtfFont:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.data = f.read()
        d = self.data
        n_tables = struct.unpack(">H", d[4:6])[0]
        self.tables = {}
        for i in range(n_tables):
            off = 12 + 16 * i
            tag = d[off:off + 4].decode("latin1")
            _, t_off, t_len = struct.unpack(">III", d[off + 4:off + 16])
            self.tables[tag] = (t_off, t_len)

        head_off = self.tables["head"][0]
        self.units_per_em = struct.unpack(">H", d[head_off + 18:head_off + 20])[0]
        self.loca_long = struct.unpack(">h", d[head_off + 50:head_off + 52])[0] == 1

        maxp_off = self.tables["maxp"][0]
        self.n_glyphs = struct.unpack(">H", d[maxp_off + 4:maxp_off + 6])[0]

        hhea_off = self.tables["hhea"][0]
        self.ascent = struct.unpack(">h", d[hhea_off + 4:hhea_off + 6])[0]
        self.descent = struct.unpack(">h", d[hhea_off + 6:hhea_off + 8])[0]
        self.n_hmetrics = struct.unpack(">H", d[hhea_off + 34:hhea_off + 36])[0]

        self._parse_cmap()
        self._parse_loca()
        self._parse_hmtx()
        self._parse_kern()
        self._glyph_cache: Dict[int, list] = {}

    # -- table parsers ------------------------------------------------------

    def _parse_cmap(self):
        d = self.data
        base = self.tables["cmap"][0]
        n = struct.unpack(">H", d[base + 2:base + 4])[0]
        best = None
        for i in range(n):
            off = base + 4 + 8 * i
            pid, eid, sub_off = struct.unpack(">HHI", d[off:off + 8])
            if (pid, eid) in ((3, 1), (0, 3), (0, 4), (3, 10)):
                fmt = struct.unpack(">H", d[base + sub_off:base + sub_off + 2])[0]
                if fmt == 4:
                    best = base + sub_off
                    break
        if best is None:
            raise ValueError("no format-4 cmap subtable")
        seg_x2 = struct.unpack(">H", d[best + 6:best + 8])[0]
        segs = seg_x2 // 2
        ends = np.frombuffer(d[best + 14:best + 14 + seg_x2], ">u2")
        s0 = best + 16 + seg_x2
        starts = np.frombuffer(d[s0:s0 + seg_x2], ">u2")
        deltas = np.frombuffer(d[s0 + seg_x2:s0 + 2 * seg_x2], ">i2")
        range_off_pos = s0 + 2 * seg_x2
        range_offs = np.frombuffer(d[range_off_pos:range_off_pos + seg_x2], ">u2")
        self._cmap4 = (int(best), segs, ends, starts, deltas, range_offs,
                       range_off_pos)

    def glyph_id(self, cp: int) -> int:
        _, segs, ends, starts, deltas, range_offs, ro_pos = self._cmap4
        i = int(np.searchsorted(ends, cp))
        if i >= segs or cp < starts[i]:
            return 0
        if range_offs[i] == 0:
            return (cp + int(deltas[i])) & 0xFFFF
        addr = ro_pos + 2 * i + int(range_offs[i]) + 2 * (cp - int(starts[i]))
        gid = struct.unpack(">H", self.data[addr:addr + 2])[0]
        return (gid + int(deltas[i])) & 0xFFFF if gid else 0

    def _parse_loca(self):
        off, _ = self.tables["loca"]
        n = self.n_glyphs + 1
        if self.loca_long:
            self.loca = np.frombuffer(self.data[off:off + 4 * n], ">u4").astype(np.int64)
        else:
            self.loca = np.frombuffer(self.data[off:off + 2 * n], ">u2").astype(np.int64) * 2

    def _parse_hmtx(self):
        off, _ = self.tables["hmtx"]
        m = np.frombuffer(self.data[off:off + 4 * self.n_hmetrics],
                          ">u2").reshape(-1, 2)
        adv = np.zeros(self.n_glyphs, np.int64)
        lsb = np.zeros(self.n_glyphs, np.int64)
        adv[:self.n_hmetrics] = m[:, 0]
        lsb[:self.n_hmetrics] = m[:, 1].astype(np.int16)
        adv[self.n_hmetrics:] = m[-1, 0]
        rest = self.n_glyphs - self.n_hmetrics
        if rest > 0:
            p = off + 4 * self.n_hmetrics
            lsb[self.n_hmetrics:] = np.frombuffer(
                self.data[p:p + 2 * rest], ">i2")
        self.advances, self.lsbs = adv, lsb

    def _parse_kern(self):
        self.kern: Dict[tuple, int] = {}
        if "kern" not in self.tables:
            return
        d = self.data
        off = self.tables["kern"][0]
        n_sub = struct.unpack(">H", d[off + 2:off + 4])[0]
        p = off + 4
        for _ in range(n_sub):
            length, coverage = struct.unpack(">HH", d[p + 2:p + 6])
            if coverage & 0xFF00 == 0 and coverage & 1:  # format 0, horiz
                n_pairs = struct.unpack(">H", d[p + 6:p + 8])[0]
                q = p + 14
                arr = np.frombuffer(d[q:q + 6 * n_pairs], ">u2").reshape(-1, 3)
                for l, r, v in arr:
                    self.kern[(int(l), int(r))] = int(np.int16(v))
            p += length

    # -- outlines -----------------------------------------------------------

    def glyph_contours(self, gid: int, depth: int = 0) -> list:
        """Expanded outline contours (quadratics flattened), font units."""
        if gid in self._glyph_cache:
            return self._glyph_cache[gid]
        d = self.data
        glyf = self.tables["glyf"][0]
        start, end = self.loca[gid], self.loca[gid + 1]
        if start == end:
            self._glyph_cache[gid] = []
            return []
        p = glyf + start
        n_contours = struct.unpack(">h", d[p:p + 2])[0]
        contours = []
        if n_contours >= 0:
            ends = np.frombuffer(d[p + 10:p + 10 + 2 * n_contours], ">u2")
            n_pts = int(ends[-1]) + 1 if n_contours else 0
            q = p + 10 + 2 * n_contours
            ins_len = struct.unpack(">H", d[q:q + 2])[0]
            q += 2 + ins_len
            # flags with repeat
            flags = np.zeros(n_pts, np.uint8)
            i = 0
            while i < n_pts:
                fl = d[q]
                q += 1
                flags[i] = fl
                i += 1
                if fl & 8:
                    rep = d[q]
                    q += 1
                    flags[i:i + rep] = fl
                    i += rep
            xs = np.zeros(n_pts, np.int64)
            x = 0
            for i in range(n_pts):
                fl = flags[i]
                if fl & 2:
                    dx = d[q]
                    q += 1
                    x += dx if fl & 16 else -dx
                elif not fl & 16:
                    x += struct.unpack(">h", d[q:q + 2])[0]
                    q += 2
                xs[i] = x
            ys = np.zeros(n_pts, np.int64)
            y = 0
            for i in range(n_pts):
                fl = flags[i]
                if fl & 4:
                    dy = d[q]
                    q += 1
                    y += dy if fl & 32 else -dy
                elif not fl & 32:
                    y += struct.unpack(">h", d[q:q + 2])[0]
                    q += 2
                ys[i] = y
            on = (flags & 1).astype(bool)
            s = 0
            for e in ends:
                contours.append(_expand_quadratic(
                    xs[s:e + 1], ys[s:e + 1], on[s:e + 1]))
                s = e + 1
        elif depth < 4:
            # composite glyph: component records
            q = p + 10
            while True:
                flags_c, comp_gid = struct.unpack(">HH", d[q:q + 4])
                q += 4
                if flags_c & 1:  # ARG_1_AND_2_ARE_WORDS
                    a1, a2 = struct.unpack(">hh", d[q:q + 4])
                    q += 4
                else:
                    a1, a2 = struct.unpack(">bb", d[q:q + 2])
                    q += 2
                m = np.eye(2)
                if flags_c & 8:  # WE_HAVE_A_SCALE
                    s_ = struct.unpack(">h", d[q:q + 2])[0] / 16384.0
                    q += 2
                    m = np.diag([s_, s_])
                elif flags_c & 0x40:  # X_AND_Y_SCALE
                    sx, sy = struct.unpack(">hh", d[q:q + 4])
                    q += 4
                    m = np.diag([sx / 16384.0, sy / 16384.0])
                elif flags_c & 0x80:  # 2x2
                    v = struct.unpack(">hhhh", d[q:q + 8])
                    q += 8
                    m = np.asarray(v, float).reshape(2, 2).T / 16384.0
                dx, dy = (a1, a2) if flags_c & 2 else (0, 0)
                for c in self.glyph_contours(comp_gid, depth + 1):
                    contours.append(c @ m.T + np.asarray([dx, dy], float))
                if not flags_c & 0x20:  # MORE_COMPONENTS
                    break
        self._glyph_cache[gid] = contours
        return contours

    # -- rasterization ------------------------------------------------------

    def rasterize(self, cp: int, px: int):
        """Rasterize codepoint `cp` at pixel size `px`. Returns
        (bitmap (h, w) float32 coverage, advance_px, bearing_x, bearing_y)
        with bearing_y = pixels from baseline up to bitmap top."""
        gid = self.glyph_id(cp)
        scale = px / self.units_per_em
        adv = self.advances[gid] * scale
        contours = self.glyph_contours(gid)
        if not contours:
            return np.zeros((1, 1), np.float32), adv, 0.0, 0.0
        pts = np.concatenate(contours)
        x0, y0 = pts.min(0) * scale
        x1, y1 = pts.max(0) * scale
        w = max(1, int(np.ceil(x1 - x0)) + 1)
        h = max(1, int(np.ceil(y1 - y0)) + 1)
        ss = 3  # supersampling
        img = np.zeros((h * ss, w * ss), np.float32)
        # pixel coords: x right, y DOWN; flip font y
        edges = []
        for c in contours:
            pc = c * scale
            ex = (pc[:, 0] - x0) * ss
            ey = (y1 - pc[:, 1]) * ss
            exn = np.roll(ex, -1)
            eyn = np.roll(ey, -1)
            keep = eyn != ey
            edges.append(np.stack([ex[keep], ey[keep], exn[keep],
                                   eyn[keep]], axis=1))
        E = np.concatenate(edges) if edges else np.zeros((0, 4))
        if len(E):
            ytop = np.minimum(E[:, 1], E[:, 3])
            ybot = np.maximum(E[:, 1], E[:, 3])
            for row in range(img.shape[0]):
                ysc = row + 0.5
                sel = (ytop <= ysc) & (ysc < ybot)
                if not sel.any():
                    continue
                e = E[sel]
                t = (ysc - e[:, 1]) / (e[:, 3] - e[:, 1])
                xc = e[:, 0] + t * (e[:, 2] - e[:, 0])
                wind = np.where(e[:, 3] > e[:, 1], 1, -1)
                order = np.argsort(xc)
                xc, wind = xc[order], wind[order]
                acc = np.cumsum(wind)
                # spans where non-zero winding
                for i in range(len(xc) - 1):
                    if acc[i] != 0:
                        a = int(np.ceil(xc[i] - 0.5))
                        b = int(np.ceil(xc[i + 1] - 0.5))
                        img[row, max(a, 0):max(b, 0)] = 1.0
        bitmap = img.reshape(h, ss, w, ss).mean(axis=(1, 3))
        return bitmap.astype(np.float32), adv, x0, y1

    def kerning(self, cp1: int, cp2: int, px: int) -> float:
        k = self.kern.get((self.glyph_id(cp1), self.glyph_id(cp2)), 0)
        return k * px / self.units_per_em


def _expand_quadratic(xs, ys, on, steps: int = 8) -> np.ndarray:
    """TrueType contour -> polyline: implied on-curve midpoints between
    consecutive off-curve points, each quadratic sampled `steps` times."""
    pts = np.stack([xs, ys], axis=1).astype(float)
    n = len(pts)
    # build alternating on/off sequence with implied midpoints
    seq = []
    for i in range(n):
        p, o = pts[i], bool(on[i])
        if seq and not seq[-1][1] and not o:
            seq.append(((seq[-1][0] + p) / 2, True))
        seq.append((p, o))
    if not seq[0][1]:
        if seq[-1][1]:
            seq.insert(0, seq.pop())
        else:
            seq.insert(0, ((seq[0][0] + seq[-1][0]) / 2, True))
    out = []
    m = len(seq)
    i = 0
    while i < m:
        p0, _ = seq[i]
        nxt = seq[(i + 1) % m]
        if nxt[1]:
            out.append(p0[None])
            i += 1
        else:
            ctrl = nxt[0]
            p2 = seq[(i + 2) % m][0]
            t = np.linspace(0, 1, steps, endpoint=False)[:, None]
            curve = ((1 - t) ** 2 * p0 + 2 * t * (1 - t) * ctrl + t ** 2 * p2)
            out.append(curve)
            i += 2
    return np.concatenate(out)


def find_system_ttf(name: str = "DejaVuSans.ttf") -> str | None:
    """Locate an open-license TTF in the environment (matplotlib ships the
    DejaVu family) — avoids checking a large binary into the repo."""
    import glob
    import os

    try:
        import matplotlib
        p = os.path.join(os.path.dirname(matplotlib.__file__),
                         "mpl-data", "fonts", "ttf", name)
        if os.path.exists(p):
            return p
    except ImportError:
        pass
    for pat in (f"/usr/share/fonts/**/{name}",
                f"/opt/**/fonts/ttf/{name}"):
        hits = glob.glob(pat, recursive=True)
        if hits:
            return hits[0]
    return None
