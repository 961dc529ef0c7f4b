"""MultiTracker facade (tracking legacy API's cv::legacy::MultiTracker):
holds several independent single-object trackers of mixed kinds and steps
them all per frame.

The single-object trackers here are functional (state in, state out), so the
facade stores (kind, state, aux) and dispatches to the right update fn.
Kinds: "mosse", "kcf", "csrt", "medianflow", "mil", "boosting".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.tracking import boosting, correlation, csrt, medianflow, mil

__all__ = ["MultiTracker"]


class MultiTracker:
    """add(kind, img, center_or_box, **kw) then update(img) each frame.
    Positions are (y, x) centers except medianflow which takes a Box."""

    def __init__(self, seed: int = 0):
        self._trackers = []
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def add(self, kind: str, img, init, **kw):
        img = jnp.asarray(img, jnp.float32)
        if kind == "mosse":
            st = correlation.mosse_init(img, init, **kw)
            aux = None
        elif kind == "kcf":
            st = correlation.kcf_init(img, init, **kw)
            aux = None
        elif kind == "csrt":
            st = csrt.csrt_init(img, init, **kw)
            aux = None
        elif kind == "medianflow":
            if isinstance(init, medianflow.Box):
                st = init
            else:
                center, size = init
                st = medianflow.Box(jnp.asarray(center, jnp.float32),
                                    jnp.asarray(size, jnp.float32))
            aux = None
        elif kind == "mil":
            bank = kw.pop("bank", None) or mil.make_feature_bank(self._next_key())
            st = mil.mil_init(img, init, self._next_key(), bank, **kw)
            aux = bank
        elif kind == "boosting":
            bank = kw.pop("bank", None) or boosting.make_feature_bank(self._next_key())
            st = boosting.boosting_init(img, init, self._next_key(), bank, **kw)
            aux = bank
        else:
            raise ValueError(f"unknown tracker kind: {kind}")
        self._trackers.append([kind, st, aux])
        return len(self._trackers) - 1

    def update(self, img, prev_img=None):
        """Step every tracker. medianflow needs the previous frame too.
        Returns a list of (y, x) centers (medianflow: box center)."""
        img = jnp.asarray(img, jnp.float32)
        out = []
        for t in self._trackers:
            kind, st, aux = t
            if kind == "mosse":
                st, _ = correlation.mosse_update(st, img)
                pos = st.center
            elif kind == "kcf":
                st, _ = correlation.kcf_update(st, img)
                pos = st.center
            elif kind == "csrt":
                st, _ = csrt.csrt_update(st, img)
                pos = st.center
            elif kind == "medianflow":
                if prev_img is None:
                    raise ValueError("medianflow requires prev_img")
                st, ok = medianflow.medianflow_update(
                    st, jnp.asarray(prev_img, jnp.float32), img)
                pos = st.center
            elif kind == "mil":
                st, _ = mil.mil_update(st, img, self._next_key(), aux)
                pos = st.center
            elif kind == "boosting":
                st, _ = boosting.boosting_update(st, img, self._next_key(), aux)
                pos = st.center
            t[1] = st
            out.append(pos)
        return out
