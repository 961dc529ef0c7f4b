"""Tests for the OCR heads: glyph classifier, Viterbi/beam decoding, CRNN."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_contrib_tpu.text import ocr, crnn


class TestGlyphs:
    def test_bank_distinct(self):
        bank = ocr.glyph_bank().reshape(len(ocr.VOCAB), -1)
        # all glyph pairs differ in at least 3 pixels
        d = np.abs(bank[:, None] - bank[None]).sum(-1)
        np.fill_diagonal(d, 99)
        assert d.min() >= 3

    def test_classify_clean(self):
        bank = ocr.glyph_bank()
        lp = np.asarray(ocr.classify_glyphs(jnp.asarray(bank), jnp.asarray(bank)))
        assert (lp.argmax(1) == np.arange(len(ocr.VOCAB))).all()

    def test_render_and_segment(self):
        img = ocr.render_text("HELLO", scale=2)
        patches = ocr.segment_characters(img)
        assert patches.shape[0] == 5


class TestHMM:
    def test_ocr_clean_text(self):
        img = ocr.render_text("KINFU42", scale=2)
        assert ocr.ocr_hmm(img) == "KINFU42"

    def test_ocr_noisy_with_lexicon(self):
        rng = np.random.default_rng(0)
        img = ocr.render_text("TRACK", scale=2, noise=0.25, rng=rng)
        lex = ["TRACK", "STACK", "TRUCK", "TRICK"]
        out = ocr.ocr_hmm(img, lexicon=lex)
        assert out == "TRACK"

    def test_viterbi_prefers_lexicon_transitions(self):
        # ambiguous second char: emissions equally favor O and Q after T;
        # lexicon containing only TO... words must pick O
        C = len(ocr.VOCAB)
        em = np.full((2, C), -10.0, np.float32)
        em[0, ocr.VOCAB.index("T")] = 0.0
        em[1, ocr.VOCAB.index("O")] = -1.0
        em[1, ocr.VOCAB.index("Q")] = -1.0
        trans = ocr.transitions_from_lexicon(["TOP", "TON", "TOT"])
        states = np.asarray(ocr.viterbi_decode(jnp.asarray(em), trans))
        assert ocr.VOCAB[states[1]] == "O"

    def test_beam_matches_viterbi_on_clean(self):
        rng = np.random.default_rng(1)
        img = ocr.render_text("BEAM", scale=2, noise=0.1, rng=rng)
        v = ocr.ocr_hmm(img)
        b = ocr.ocr_hmm(img, use_beam=True, beam=8)
        assert v == b == "BEAM"


class TestCRNN:
    def test_learns_small_vocab(self):
        words = ["AB", "CD", "EF", "GH"]
        model, params = crnn.train_crnn(words, n_steps=1000, W=40, max_len=4,
                                        features=48, seed=0, lr=5e-3)
        rng = np.random.default_rng(2)
        imgs, _, _ = crnn.make_batch(words, 20, 40, 4, rng, noise=0.0)
        out = crnn.recognize(model, params, imgs)
        exact = sum(o == w for o, w in zip(out, words))
        chars = sum(a == b for o, w in zip(out, words)
                    for a, b in zip(o.ljust(2), w))
        assert exact >= 2 and chars >= 6

    def test_decode_collapses_blanks_and_repeats(self):
        C = crnn.N_CLASSES
        T = 6
        logits = np.full((1, T, C), -5.0, np.float32)
        a = ocr.VOCAB.index("A") + 1
        b = ocr.VOCAB.index("B") + 1
        seq = [a, a, 0, a, b, 0]
        for t, s in enumerate(seq):
            logits[0, t, s] = 5.0
        assert crnn.ctc_greedy_decode(jnp.asarray(logits)) == ["AAB"]
