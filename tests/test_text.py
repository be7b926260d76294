import numpy as np
import jax.numpy as jnp

from ocrs_models_tpu.config import DEFAULT_ALPHABET
from ocrs_models_tpu.utils.text import (
    ctc_greedy_decode_batch,
    ctc_greedy_decode_text,
    decode_text,
    encode_text,
    levenshtein,
)


def test_alphabet_size():
    assert len(DEFAULT_ALPHABET) == 96
    assert "€" in DEFAULT_ALPHABET


def test_encode_decode_roundtrip():
    text = "Hello, World! 42 €"
    enc = encode_text(text, DEFAULT_ALPHABET)
    assert enc.dtype == np.int32
    assert enc.min() >= 1  # 0 is reserved for CTC blank
    assert decode_text(enc, DEFAULT_ALPHABET) == text


def test_encode_unknown_char():
    enc = encode_text("aé", DEFAULT_ALPHABET, unknown_char="?")
    assert decode_text(enc, DEFAULT_ALPHABET) == "a?"


def test_decode_skips_blanks():
    enc = [0, 1, 0, 2, 0]
    assert decode_text(enc, DEFAULT_ALPHABET) == DEFAULT_ALPHABET[0] + DEFAULT_ALPHABET[1]


def test_ctc_greedy_decode_text():
    # b l a n k collapse: [1,1,0,1,2,2,0,0,3] -> chars at idx 1,1,2,3
    a = "abc"
    seq = [1, 1, 0, 1, 2, 2, 0, 0, 3]
    assert ctc_greedy_decode_text(seq, a) == "aabc"
    assert ctc_greedy_decode_text([], a) == ""
    assert ctc_greedy_decode_text([0, 0], a) == ""


def test_ctc_greedy_decode_batch_matches_host():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 5, size=(8, 20)).astype(np.int32)
    lens = rng.integers(0, 21, size=(8,)).astype(np.int32)
    dec, dec_lens = ctc_greedy_decode_batch(jnp.array(ids), jnp.array(lens))
    dec = np.asarray(dec)
    dec_lens = np.asarray(dec_lens)
    alphabet = "abcd"
    for i in range(8):
        expect = ctc_greedy_decode_text(ids[i, : lens[i]], alphabet)
        got = decode_text(dec[i, : dec_lens[i]], alphabet)
        assert got == expect
        # Padding stays blank.
        assert (dec[i, dec_lens[i] :] == 0).all()


def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2
    assert levenshtein("abc", "acb") == 2


def test_levenshtein_random_vs_reference_dp():
    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            ndp = [i + 1]
            for j, cb in enumerate(b):
                ndp.append(min(dp[j + 1] + 1, ndp[j] + 1, dp[j] + (ca != cb)))
            dp = ndp
        return dp[-1]

    rng = np.random.default_rng(1)
    for _ in range(25):
        a = "".join(rng.choice(list("abcde"), size=rng.integers(0, 12)))
        b = "".join(rng.choice(list("abcde"), size=rng.integers(0, 12)))
        assert levenshtein(a, b) == ref(a, b)


class TestBeamSearch:
    def _lp(self, rows):
        x = np.array(rows, dtype=np.float64)
        x = np.log(x / x.sum(axis=1, keepdims=True))
        return x

    def test_matches_greedy_on_peaked_probs(self):
        from ocrs_models_tpu.utils.text import ctc_beam_search_decode

        # Near-one-hot per step: beam search == greedy path.
        alphabet = "ab"
        lp = self._lp([[0.01, 0.98, 0.01], [0.98, 0.01, 0.01], [0.01, 0.01, 0.98]])
        assert ctc_beam_search_decode(lp, alphabet) == "ab"

    def test_beats_greedy_on_split_mass(self):
        from ocrs_models_tpu.utils.text import ctc_beam_search_decode

        # Classic case: greedy picks blank at each step ("" after collapse),
        # but total probability mass of label 'a' paths is higher.
        alphabet = "a"
        lp = self._lp([[0.4, 0.6], [0.6, 0.4]])
        # Greedy: argmax = [a, blank] -> "a"... pick a sharper example:
        lp = self._lp([[0.5, 0.5], [0.5, 0.5]])
        out = ctc_beam_search_decode(lp, alphabet, beam_width=4)
        # P("") = 0.25 (blank,blank); P("a") = 0.75 -> beam must return "a".
        assert out == "a"

    def test_empty_and_blank_only(self):
        from ocrs_models_tpu.utils.text import ctc_beam_search_decode

        lp = self._lp([[0.99, 0.01], [0.99, 0.01]])
        assert ctc_beam_search_decode(lp, "a") == ""

    def test_repeat_needs_blank(self):
        from ocrs_models_tpu.utils.text import ctc_beam_search_decode

        # a a -> "a" (collapsed); a blank a -> "aa".
        alphabet = "a"
        lp = self._lp([[0.05, 0.95], [0.9, 0.1], [0.05, 0.95]])
        assert ctc_beam_search_decode(lp, alphabet) == "aa"
