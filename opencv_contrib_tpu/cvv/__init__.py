"""cvv — visual-debug call recorder (reference: modules/cvv).

The reference is a Qt GUI debugger: `cvv::showImage/debugFilter/debugDMatch`
capture images + call-site metadata (`CVVISUAL_LOCATION`,
cvv/include/opencv2/cvv/call_meta_data.hpp:65) and `finalShow()` opens an
interactive browser with an stfl query language for filtering calls
(cvv's stfl/ parser). A headless TPU pod has no Qt; the TPU-native design
keeps the *debugging contract* — zero-friction call capture with automatic
call-site metadata and queryable sessions — and renders to a static HTML
gallery + PNGs instead of a window.

API parity:
- show_image(img, description=...)        <-> cvv::showImage (show_image.hpp)
- debug_filter(original, result, ...)     <-> cvv::debugFilter (filter.hpp)
- debug_dmatch(img1, kps1, img2, kps2, matches, ...) <-> cvv::debugDMatch
- final_show(outdir)                      <-> cvv::finalShow
- query("file:foo line:>10 txt")          <-> stfl filter queries
"""

from __future__ import annotations

import dataclasses
import html
import inspect
import os
import time
from typing import List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class CallData:
    """One captured debug call (call_meta_data.hpp: file/line/function)."""
    kind: str
    description: str
    view: str
    file: str
    line: int
    function: str
    images: List[np.ndarray]
    ts: float
    index: int

    def matches(self, key: str, val: str) -> bool:
        if key == "file":
            return val in self.file
        if key == "function":
            return val in self.function
        if key == "kind":
            return self.kind == val
        if key == "line":
            if val[:2] in (">=", "<="):
                op, num = val[:2], int(val[2:])
            elif val[:1] in "<>":
                op, num = val[:1], int(val[1:])
            else:
                op, num = "==", int(val)
            return {"==": self.line == num, ">": self.line > num,
                    "<": self.line < num, ">=": self.line >= num,
                    "<=": self.line <= num}[op]
        return False


class DebugSession:
    def __init__(self):
        self.calls: List[CallData] = []
        self.enabled = True

    def _caller(self):
        for fr in inspect.stack()[2:]:
            fn = fr.filename
            if os.sep + "cvv" + os.sep not in fn:
                return fn, fr.lineno, fr.function
        return "<unknown>", 0, "<unknown>"

    def _add(self, kind, description, view, images):
        if not self.enabled:
            return
        f, l, fn = self._caller()
        self.calls.append(CallData(
            kind=kind, description=description, view=view, file=f, line=l,
            function=fn, images=[np.asarray(im) for im in images],
            ts=time.time(), index=len(self.calls)))

    # --- capture API ---
    def show_image(self, img, description: str = "", view: str = ""):
        self._add("single_image", description, view, [img])

    def debug_filter(self, original, result, description: str = "",
                     view: str = ""):
        self._add("filter", description, view, [original, result])

    def debug_dmatch(self, img1, keypoints1, img2, keypoints2, matches,
                     description: str = "", view: str = "",
                     use_train_descriptor: bool = True):
        vis = draw_matches(img1, keypoints1, img2, keypoints2, matches)
        self._add("dmatch", description, view, [img1, img2, vis])

    # --- stfl-style query: space-separated "key:value" filters; a bare
    # token matches the description substring ---
    def query(self, q: str) -> List[CallData]:
        out = list(self.calls)
        for tok in q.split():
            if ":" in tok:
                k, v = tok.split(":", 1)
                out = [c for c in out if c.matches(k, v)]
            else:
                out = [c for c in out if tok in c.description]
        return out

    def final_show(self, outdir: str) -> str:
        """Write PNGs + an index.html gallery; returns the html path."""
        from opencv_contrib_tpu.utils import io
        os.makedirs(outdir, exist_ok=True)
        rows = []
        for c in self.calls:
            tags = []
            for j, im in enumerate(c.images):
                arr = np.asarray(im)
                if arr.dtype != np.uint8:
                    arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
                name = f"call{c.index:04d}_{j}.png"
                io.imwrite(os.path.join(outdir, name), arr)
                tags.append(f'<img src="{name}" style="max-width:320px">')
            rows.append(
                "<tr><td>{}</td><td>{}</td><td><code>{}:{}</code><br>{}</td>"
                "<td>{}</td></tr>".format(
                    c.index, html.escape(c.kind),
                    html.escape(os.path.basename(c.file)), c.line,
                    html.escape(c.function), " ".join(tags)))
            rows[-1] += f"<tr><td></td><td colspan=3>{html.escape(c.description)}</td></tr>"
        page = ("<html><body><h1>cvv debug session</h1>"
                "<table border=1 cellspacing=0>" + "".join(rows)
                + "</table></body></html>")
        path = os.path.join(outdir, "index.html")
        with open(path, "w") as f:
            f.write(page)
        return path

    def clear(self):
        self.calls.clear()


def draw_matches(img1, kps1, img2, kps2, matches) -> np.ndarray:
    """Side-by-side match visualization (the dmatch view's raster)."""
    a = _to_rgb(np.asarray(img1))
    b = _to_rgb(np.asarray(img2))
    H = max(a.shape[0], b.shape[0])
    W = a.shape[1] + b.shape[1]
    canvas = np.zeros((H, W, 3), np.float32)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], a.shape[1]:] = b
    kps1 = np.asarray(kps1, np.float32).reshape(-1, 2)
    kps2 = np.asarray(kps2, np.float32).reshape(-1, 2)
    for qi, ti in np.asarray(matches, np.int64).reshape(-1, 2):
        if qi < 0 or ti < 0 or qi >= len(kps1) or ti >= len(kps2):
            continue
        x0, y0 = kps1[qi]
        x1, y1 = kps2[ti]
        x1 = x1 + a.shape[1]
        n = max(2, int(max(abs(x1 - x0), abs(y1 - y0))))
        xs = np.linspace(x0, x1, n).round().astype(int)
        ys = np.linspace(y0, y1, n).round().astype(int)
        ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
        canvas[ys[ok], xs[ok]] = (0.2, 1.0, 0.2)
    return canvas


def _to_rgb(a: np.ndarray) -> np.ndarray:
    a = a.astype(np.float32)
    if a.max() > 1.5:
        a = a / 255.0
    if a.ndim == 2:
        a = np.stack([a] * 3, -1)
    return a[:, :, :3]


_session = DebugSession()

show_image = _session.show_image
debug_filter = _session.debug_filter
debug_dmatch = _session.debug_dmatch
final_show = _session.final_show
query = _session.query
clear = _session.clear


def set_debug_flag(enabled: bool):
    """cvv::setDebugFlag (debug_mode.hpp)."""
    _session.enabled = enabled


def get_session() -> DebugSession:
    return _session
