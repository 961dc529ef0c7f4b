"""OCR heads: character classification + HMM Viterbi / beam-search decoding.

Reference anchors (text):
- src/ocr_hmm_decoder.cpp — OCRHMMDecoder::run: per-segment character
  classifier posteriors + HMM language-model decoding (Viterbi), lexicon
  constrained transition matrices (createOCRHMMTransitionsTable)
- src/ocr_beamsearch_decoder.cpp — OCRBeamSearchDecoder::run: beam search
  over per-window classifier posteriors
- src/ocr_holistic.cpp — holistic word spotting (the CRNN-class model in
  text.crnn plays that role)

TPU-first: glyph classification is one NCC matmul against the template
bank; Viterbi is a `lax.scan` over time with a dense (C, C) transition
matrix; beam search keeps a static (B,) beam with top_k pruning per step.
The built-in 5x7 glyph bank doubles as the synthetic-text renderer used to
train the CRNN (zero-egress-friendly: no external fonts or models).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# 5x7 glyph bank (A-Z, 0-9) — rows of 5 chars, '#' = ink
# ---------------------------------------------------------------------------

_GLYPHS = {
    "A": [" ### ", "#   #", "#   #", "#####", "#   #", "#   #", "#   #"],
    "B": ["#### ", "#   #", "#   #", "#### ", "#   #", "#   #", "#### "],
    "C": [" ####", "#    ", "#    ", "#    ", "#    ", "#    ", " ####"],
    "D": ["###  ", "#  # ", "#   #", "#   #", "#   #", "#  # ", "###  "],
    "E": ["#####", "#    ", "#    ", "#### ", "#    ", "#    ", "#####"],
    "F": ["#####", "#    ", "#    ", "#### ", "#    ", "#    ", "#    "],
    "G": [" ####", "#    ", "#    ", "#  ##", "#   #", "#   #", " ### "],
    "H": ["#   #", "#   #", "#   #", "#####", "#   #", "#   #", "#   #"],
    "I": [" ### ", "  #  ", "  #  ", "  #  ", "  #  ", "  #  ", " ### "],
    "J": ["  ###", "   # ", "   # ", "   # ", "   # ", "#  # ", " ##  "],
    "K": ["#   #", "#  # ", "# #  ", "##   ", "# #  ", "#  # ", "#   #"],
    "L": ["#    ", "#    ", "#    ", "#    ", "#    ", "#    ", "#####"],
    "M": ["#   #", "## ##", "# # #", "# # #", "#   #", "#   #", "#   #"],
    "N": ["#   #", "##  #", "# # #", "#  ##", "#   #", "#   #", "#   #"],
    "O": [" ### ", "#   #", "#   #", "#   #", "#   #", "#   #", " ### "],
    "P": ["#### ", "#   #", "#   #", "#### ", "#    ", "#    ", "#    "],
    "Q": [" ### ", "#   #", "#   #", "#   #", "# # #", "#  # ", " ## #"],
    "R": ["#### ", "#   #", "#   #", "#### ", "# #  ", "#  # ", "#   #"],
    "S": [" ####", "#    ", "#    ", " ### ", "    #", "    #", "#### "],
    "T": ["#####", "  #  ", "  #  ", "  #  ", "  #  ", "  #  ", "  #  "],
    "U": ["#   #", "#   #", "#   #", "#   #", "#   #", "#   #", " ### "],
    "V": ["#   #", "#   #", "#   #", "#   #", "#   #", " # # ", "  #  "],
    "W": ["#   #", "#   #", "#   #", "# # #", "# # #", "## ##", "#   #"],
    "X": ["#   #", "#   #", " # # ", "  #  ", " # # ", "#   #", "#   #"],
    "Y": ["#   #", "#   #", " # # ", "  #  ", "  #  ", "  #  ", "  #  "],
    "Z": ["#####", "    #", "   # ", "  #  ", " #   ", "#    ", "#####"],
    "0": [" ### ", "#   #", "#  ##", "# # #", "##  #", "#   #", " ### "],
    "1": ["  #  ", " ##  ", "  #  ", "  #  ", "  #  ", "  #  ", " ### "],
    "2": [" ### ", "#   #", "    #", "   # ", "  #  ", " #   ", "#####"],
    "3": [" ### ", "#   #", "    #", "  ## ", "    #", "#   #", " ### "],
    "4": ["   # ", "  ## ", " # # ", "#  # ", "#####", "   # ", "   # "],
    "5": ["#####", "#    ", "#### ", "    #", "    #", "#   #", " ### "],
    "6": [" ### ", "#    ", "#    ", "#### ", "#   #", "#   #", " ### "],
    "7": ["#####", "    #", "   # ", "  #  ", " #   ", " #   ", " #   "],
    "8": [" ### ", "#   #", "#   #", " ### ", "#   #", "#   #", " ### "],
    "9": [" ### ", "#   #", "#   #", " ####", "    #", "    #", " ### "],
}

VOCAB = "".join(sorted(_GLYPHS.keys()))
GLYPH_H, GLYPH_W = 7, 5


def glyph_bank() -> np.ndarray:
    """(C, 7, 5) float32 glyph templates in VOCAB order."""
    out = np.zeros((len(VOCAB), GLYPH_H, GLYPH_W), np.float32)
    for i, ch in enumerate(VOCAB):
        for r, row in enumerate(_GLYPHS[ch]):
            for c, v in enumerate(row):
                out[i, r, c] = 1.0 if v == "#" else 0.0
    return out


def render_text(s: str, scale: int = 2, spacing: int = 1, pad: int = 2,
                noise: float = 0.0, rng=None) -> np.ndarray:
    """Rasterize a string with the built-in bank (the synthetic data source
    for training/evaluating the OCR heads)."""
    bank = glyph_bank()
    cols = []
    gap = np.zeros((GLYPH_H, spacing), np.float32)
    for ch in s.upper():
        if ch == " ":
            cols.append(np.zeros((GLYPH_H, GLYPH_W), np.float32))
        else:
            cols.append(bank[VOCAB.index(ch)])
        cols.append(gap)
    img = np.concatenate(cols[:-1] if spacing else cols, axis=1)
    img = np.kron(img, np.ones((scale, scale), np.float32))
    img = np.pad(img, pad)
    if noise and rng is not None:
        img = img + rng.normal(0, noise, img.shape).astype(np.float32)
    return img


# ---------------------------------------------------------------------------
# Character classification (NCC against the bank)
# ---------------------------------------------------------------------------


@jax.jit
def classify_glyphs(patches: jnp.ndarray, bank: jnp.ndarray) -> jnp.ndarray:
    """Log-posteriors (N, C) of (N, 7, 5)-normalized patches against the
    bank via normalized cross-correlation -> softmax (the role of the
    reference's KNN/CNN character classifier)."""
    P = patches.reshape(patches.shape[0], -1)
    B = bank.reshape(bank.shape[0], -1)
    P = (P - P.mean(1, keepdims=True))
    P = P / jnp.maximum(jnp.linalg.norm(P, axis=1, keepdims=True), 1e-9)
    Bn = B - B.mean(1, keepdims=True)
    Bn = Bn / jnp.maximum(jnp.linalg.norm(Bn, axis=1, keepdims=True), 1e-9)
    ncc = P @ Bn.T  # (N, C)
    return jax.nn.log_softmax(ncc * 10.0, axis=-1)


def segment_characters(img: np.ndarray, thresh: float = 0.3):
    """Split a text-line image into per-character patches by ink column
    projection (the word segmentation OCRHMMDecoder expects); returns
    (N, 7, 5) resampled patches."""
    from opencv_contrib_tpu.ops.image import resize
    from opencv_contrib_tpu.ops import filters

    sm = np.asarray(filters.gaussian_blur(jnp.asarray(img, jnp.float32), 0.8))
    ink = sm > thresh
    colmass = ink.sum(0)
    on = colmass > max(1, 0.12 * colmass.max())
    # runs of on-columns
    edges = np.diff(on.astype(np.int8))
    starts = list(np.where(edges == 1)[0] + 1)
    ends = list(np.where(edges == -1)[0] + 1)
    if on[0]:
        starts = [0] + starts
    if on[-1]:
        ends = ends + [len(on)]
    # split runs that merged two glyphs (wider than 1.6x the median run)
    widths = [e - s for s, e in zip(starts, ends)]
    if widths:
        med = float(np.median(widths))
        split_s, split_e = [], []
        for s, e in zip(starts, ends):
            if e - s > 1.6 * med and e - s >= 6:
                mid_lo = s + (e - s) // 4
                mid_hi = e - (e - s) // 4
                cut = mid_lo + int(np.argmin(colmass[mid_lo:mid_hi]))
                split_s += [s, cut]
                split_e += [cut, e]
            else:
                split_s.append(s)
                split_e.append(e)
        starts, ends = split_s, split_e
    patches = []
    for s, e in zip(starts, ends):
        rows = np.where(ink[:, s:e].any(1))[0]
        if len(rows) == 0:
            continue
        crop = np.asarray(img)[rows[0]:rows[-1] + 1, s:e]
        patches.append(np.asarray(resize(jnp.asarray(crop, jnp.float32),
                                         (GLYPH_H, GLYPH_W))))
    if not patches:
        return np.zeros((0, GLYPH_H, GLYPH_W), np.float32)
    return np.stack(patches)


# ---------------------------------------------------------------------------
# HMM decoding
# ---------------------------------------------------------------------------


def transitions_from_lexicon(words, smoothing: float = 1e-3) -> jnp.ndarray:
    """Bigram transition log-probs (C, C) from a word list (parity:
    cv::text::createOCRHMMTransitionsTable)."""
    C = len(VOCAB)
    counts = np.full((C, C), smoothing, np.float64)
    for w in words:
        w = [c for c in w.upper() if c in VOCAB]
        for a, b in zip(w[:-1], w[1:]):
            counts[VOCAB.index(a), VOCAB.index(b)] += 1.0
    P = counts / counts.sum(1, keepdims=True)
    return jnp.asarray(np.log(P), jnp.float32)


@jax.jit
def viterbi_decode(emissions: jnp.ndarray, transitions: jnp.ndarray) -> jnp.ndarray:
    """MAP state sequence of an HMM (parity: OCRHMMDecoder::run decoding
    step): emissions (T, C) log-probs, transitions (C, C) log-probs.
    Returns (T,) int32 states."""

    def fwd(delta, em):
        scores = delta[:, None] + transitions + em[None, :]
        return jnp.max(scores, axis=0), jnp.argmax(scores, axis=0)

    delta0 = emissions[0]
    deltaT, backs = jax.lax.scan(fwd, delta0, emissions[1:])

    def back(state, back_t):
        return back_t[state], state

    last = jnp.argmax(deltaT)  # deltaT is the final carry (C,)
    first, states = jax.lax.scan(back, last, backs, reverse=True)
    return jnp.concatenate([first[None], states])


@partial(jax.jit, static_argnames=("beam",))
def beam_search_decode(emissions: jnp.ndarray, transitions: jnp.ndarray,
                       beam: int = 8):
    """Beam-search decoding (parity: OCRBeamSearchDecoder::run): keeps the
    `beam` best partial paths per step; returns ((T,) best path, score)."""
    T, C = emissions.shape
    # beams: scores (B,), last state (B,), paths (B, T)
    scores0, states0 = jax.lax.top_k(emissions[0], beam)
    paths0 = jnp.zeros((beam, T), jnp.int32).at[:, 0].set(states0)

    def step(carry, inp):
        t, em = inp
        scores, last, paths = carry
        # expand: (B, C)
        cand = scores[:, None] + transitions[last] + em[None, :]
        flat = cand.reshape(-1)
        top_v, top_i = jax.lax.top_k(flat, beam)
        b_idx = top_i // C
        c_idx = top_i % C
        paths = paths[b_idx]
        paths = jax.vmap(lambda p, c: p.at[t].set(c))(paths, c_idx)
        return (top_v, c_idx, paths), None

    ts = jnp.arange(1, T)
    (scores, _, paths), _ = jax.lax.scan(step, (scores0, states0, paths0),
                                         (ts, emissions[1:]))
    best = jnp.argmax(scores)
    return paths[best], scores[best]


def ocr_hmm(img, lexicon=None, use_beam: bool = False, beam: int = 8) -> str:
    """One-call OCR of a rendered text line (parity: OCRHMMDecoder::run /
    OCRBeamSearchDecoder::run): segment -> classify -> decode."""
    patches = segment_characters(np.asarray(img))
    if len(patches) == 0:
        return ""
    bank = jnp.asarray(glyph_bank())
    em = classify_glyphs(jnp.asarray(patches), bank)
    if lexicon:
        trans = transitions_from_lexicon(lexicon)
    else:
        trans = jnp.zeros((len(VOCAB), len(VOCAB)))
    if use_beam:
        states, _ = beam_search_decode(em, trans, beam=beam)
    else:
        states = viterbi_decode(em, trans)
    return "".join(VOCAB[int(s)] for s in np.asarray(states))
