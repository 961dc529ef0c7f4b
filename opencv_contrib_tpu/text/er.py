"""Extremal-region (ER) text detection cascade.

Reference anchor: text/src/erfilter.cpp (Neumann-Matas): a component tree
over grayscale thresholds with incrementally-computed features (area, bbox,
perimeter, Euler number / hole count, horizontal crossings) scored by a
2-stage classifier; surviving regions are the character candidates.

TPU-first: instead of the reference's sequential flood-fill component tree,
every threshold level is labeled INDEPENDENTLY and in parallel (vmap over
the level axis of a thresholded stack) — the component tree's levels become
a batch dimension. Features per region come from scatter-adds; the stage-1
probability is a closed-form logistic on the same features the reference
feeds its boosted trees. Cross-level duplicates collapse via box IoU NMS
(host, like the reference's branch pruning).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops.ccl import component_stats, connected_components


@partial(jax.jit, static_argnames=("n_levels", "max_components", "dark_on_light"))
def er_level_features(img, n_levels: int = 16, max_components: int = 128, dark_on_light: bool = True):
    """Label each threshold level and compute region features.

    Returns dict of (n_levels, max_components) arrays: area, bbox, perimeter,
    crossings (mean horizontal crossings over 3 rows — erfilter.cpp's
    incremental feature), hole proxy (Euler number via 2x2 quad counts:
    holes = C + Q3diag - ... simplified to quad-based Euler count).
    """
    H, W = img.shape
    # evenly spaced gray-level thresholds over the image range (erfilter.cpp
    # steps the component tree one delta at a time)
    lo, hi = img.min(), img.max()
    fr = (jnp.arange(1, n_levels + 1) / (n_levels + 1)).astype(img.dtype)
    ths = lo + fr * (hi - lo)

    def one_level(t):
        mask = (img <= t) if dark_on_light else (img >= t)
        labels, _ = connected_components(mask, connectivity=4)
        st = component_stats(labels, max_components=max_components)
        cid = st["cid_map"]  # (H, W) compact id or -1
        # perimeter: count 4-neighbor transitions out of the component
        p = jnp.pad(cid, 1, constant_values=-1)
        per = jnp.zeros(max_components + 1)
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            nbr = p[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            diff = (cid >= 0) & (nbr != cid)
            per = per.at[jnp.where(diff, cid, max_components).reshape(-1)].add(
                diff.reshape(-1).astype(jnp.float32)
            )
        # Euler number via quad counts (Gray's formula): E = (Q1 - Q3 + 2*Qd)/4,
        # holes = 1 - E per component
        b = (cid >= 0).astype(jnp.int32)
        pb = jnp.pad(b, ((1, 0), (1, 0)))
        q = pb[:-1, :-1] + pb[:-1, 1:] + pb[1:, :-1] + pb[1:, 1:]
        qd = (pb[:-1, :-1] == pb[1:, 1:]) & (pb[:-1, 1:] == pb[1:, :-1]) & (pb[:-1, :-1] != pb[:-1, 1:])
        # attribute each quad to a component id present in it (top-left-most fg)
        cpad = jnp.pad(cid, ((1, 0), (1, 0)), constant_values=-1)
        quad_cid = jnp.maximum(
            jnp.maximum(cpad[:-1, :-1], cpad[:-1, 1:]), jnp.maximum(cpad[1:, :-1], cpad[1:, 1:])
        )
        tgt = jnp.where(quad_cid >= 0, quad_cid, max_components).reshape(-1)
        e_acc = jnp.zeros(max_components + 1)
        e_acc = e_acc.at[tgt].add(((q == 1).astype(jnp.float32) - (q == 3).astype(jnp.float32) + 2 * qd.astype(jnp.float32)).reshape(-1))
        euler = e_acc[:max_components] / 4.0
        # horizontal crossings at 3 heights (erfilter incremental feature)
        y0 = st["y0"].astype(jnp.int32)
        hgt = (st["y1"] - st["y0"] + 1).astype(jnp.int32)
        crossings = jnp.zeros(max_components)
        for frac_n, frac_d in ((1, 6), (3, 6), (5, 6)):
            rows = jnp.clip(y0 + hgt * frac_n // frac_d, 0, H - 1)  # (C,)
            row_cid = cid[rows]  # (C, W)
            me = row_cid == jnp.arange(max_components)[:, None]
            trans = (me[:, 1:] != me[:, :-1]).sum(-1) + me[:, 0] + me[:, -1]
            crossings = crossings + trans / 2.0
        crossings = crossings / 3.0
        return {
            "area": st["area"], "y0": st["y0"], "x0": st["x0"], "y1": st["y1"],
            "x1": st["x1"], "valid": st["valid"], "perimeter": per[:max_components],
            "euler": euler, "crossings": crossings,
        }

    return jax.vmap(one_level)(ths)


def _stage1_prob(feat):
    """Closed-form stage-1 classifier on the NM features: characters have
    moderate aspect, compact perimeter (low perimeter^2/area), few holes,
    and 1-4 horizontal crossings. Logistic surrogate of the reference's
    boosted trees (erfilter.cpp loadClassifierNM1)."""
    area = np.maximum(feat["area"], 1.0)
    h = feat["y1"] - feat["y0"] + 1
    w = feat["x1"] - feat["x0"] + 1
    aspect = np.maximum(h / np.maximum(w, 1), w / np.maximum(h, 1))
    compact = feat["perimeter"] ** 2 / area
    holes = np.maximum(1.0 - feat["euler"], 0.0)
    cross = feat["crossings"]
    z = (
        2.6
        - 0.25 * np.maximum(aspect - 4.0, 0)
        - 0.035 * np.maximum(compact - 20.0, 0)
        - 0.8 * np.abs(1.0 - feat["euler"])  # ragged/multi-hole shapes
        - 1.2 * np.maximum(holes - 2.0, 0)
        - 0.6 * np.maximum(cross - 4.0, 0)
        - 0.4 * np.maximum(1.0 - cross, 0)
    )
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))


def er_detect(img, n_levels: int = 16, max_components: int = 128,
              dark_on_light: bool = True, min_prob: float = 0.5,
              min_area: int = 12, max_area_frac: float = 0.4, nms_iou: float = 0.6):
    """Run the ER cascade. Returns (boxes (N, 4) numpy [y0, x0, y1, x1],
    probs (N,)) after cross-level NMS."""
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    feat = {k: np.asarray(v) for k, v in er_level_features(
        img, n_levels=n_levels, max_components=max_components, dark_on_light=dark_on_light).items()}
    prob = _stage1_prob(feat)
    keep = (
        feat["valid"]
        & (prob >= min_prob)
        & (feat["area"] >= min_area)
        & (feat["area"] <= max_area_frac * H * W)
    )
    boxes = np.stack([feat["y0"], feat["x0"], feat["y1"], feat["x1"]], axis=-1)[keep]
    probs = prob[keep]
    if boxes.shape[0] == 0:
        return boxes.reshape(0, 4), probs
    # NMS across levels (duplicate branches of the component tree)
    order = np.argsort(-probs)
    chosen = []
    for i in order:
        ok = True
        for j in chosen:
            a, b = boxes[i], boxes[j]
            yy0, xx0 = max(a[0], b[0]), max(a[1], b[1])
            yy1, xx1 = min(a[2], b[2]), min(a[3], b[3])
            inter = max(yy1 - yy0 + 1, 0) * max(xx1 - xx0 + 1, 0)
            ua = (a[2] - a[0] + 1) * (a[3] - a[1] + 1) + (b[2] - b[0] + 1) * (b[3] - b[1] + 1) - inter
            if inter / max(ua, 1e-9) > nms_iou:
                ok = False
                break
        if ok:
            chosen.append(i)
    return boxes[chosen], probs[chosen]
