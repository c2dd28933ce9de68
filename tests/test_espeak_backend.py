"""espeak ctypes-backend logic, tested without libespeak-ng.

The live library is absent from this image (verified; ROADMAP #2), but
everything AROUND the espeak call is pure Python and testable:

1. reconstruct_clause_phonemes must rebuild the exact piper-phonemize
   phoneme contract (single-space word separators, clause punctuation
   as phonemes followed by a space, terminal punctuation last — what
   the reference's patched espeak_TextToPhonemesWithTerminator
   produces, piper.cpp:218-219) from what STOCK espeak returns: IPA
   with spaces and NO punctuation. The oracle is the reference's own
   fixture files: stripping the punctuation/space structure out of a
   fixture's phonemes simulates the stock-espeak output, and
   reconstruction must round-trip to the fixture exactly.
2. phonemize_espeak's ctypes chunk loop + clause orchestration, via a
   fake libespeak.
"""

import ctypes
import json
from pathlib import Path

import pytest

import importlib

P = importlib.import_module("piper_tpu.text.phonemize")

FIXTURES = Path("/root/reference/etc/test_sentences")
TERMS = set(",.;:!?…")


def _fixture_records(lang="test_en-us.jsonl"):
    return [
        json.loads(l)
        for l in (FIXTURES / lang).read_text().splitlines()
        if l.strip()
    ]


def _stock_espeak_ipa(phonemes):
    """Simulate stock espeak output per clause from fixture phonemes:
    drop the punctuation phonemes the patched API reports, split into
    clauses at them, words separated by single spaces."""
    clauses, cur = [], []
    for p in phonemes:
        if p in TERMS:
            clauses.append("".join(cur).strip())
            cur = []
        else:
            cur.append(p)
    if "".join(cur).strip():
        clauses.append("".join(cur).strip())
    return clauses


def test_reconstruction_roundtrips_fixture_contract():
    """For every en-us fixture sentence: simulated stock-espeak clause
    IPA + the sentence text reconstruct the fixture phonemes EXACTLY —
    the documented terminator drift (DIVERGENCES #11) is closed at the
    contract level."""
    checked = 0
    for rec in _fixture_records():
        text, want = rec["text"], rec["phonemes"]
        clause_ipa = _stock_espeak_ipa(want)
        got = P.reconstruct_clause_phonemes(text, clause_ipa)
        assert got == want, f"mismatch for: {text[:50]}..."
        checked += 1
    assert checked >= 5


def _strip_term_adjacent_space(seq):
    """Drop ' ' phonemes immediately before/after a clause terminator.
    Whether piper-phonemize emits them is language-internal to espeak
    (en ', ': yes; ca ',': no; uk ' ,': space BEFORE — all with the
    same source spacing) — unknowable without the library, so
    multilingual round-trips compare modulo terminator-adjacent
    spaces. The exact en-us test above pins the en behavior."""
    out = []
    for i, p in enumerate(seq):
        if p == " " and (
            (i and seq[i - 1] in TERMS)
            or (i + 1 < len(seq) and seq[i + 1] in TERMS)
        ):
            continue
        out.append(p)
    return out


def test_reconstruction_multilingual():
    """Round-trip over every language fixture whose sentence
    punctuation appears 1:1 in its phonemes (25+ languages, non-Latin
    scripts included), modulo terminator-adjacent spaces (see
    _strip_term_adjacent_space)."""
    langs = set()
    checked = 0
    for path in sorted(FIXTURES.glob("test_*.jsonl")):
        for rec in _fixture_records(path.name):
            text, want = rec["text"], rec["phonemes"]
            if any(c in text for c in "—–()«»"):
                # espeak's own clause logic remaps these (observed:
                # ka em-dash -> ',' while a later real comma is
                # dropped) — the patched espeak is the only source
                # of truth there
                continue
            text_terms = [c for _, c, _ in P.split_clauses(text) if c]
            ph_terms = [p for p in want if p in TERMS]
            if text_terms != ph_terms:
                # punctuation not mirrored 1:1 into phonemes (e.g.
                # Arabic '،', zh ideographic stops) — same caveat
                continue
            got = P.reconstruct_clause_phonemes(
                text, _stock_espeak_ipa(want)
            )
            assert _strip_term_adjacent_space(got) == \
                _strip_term_adjacent_space(want), f"{path.name}: {text[:40]}"
            checked += 1
            langs.add(path.name)
    assert len(langs) >= 20 and checked >= 140


def test_split_clauses():
    assert P.split_clauses("Hello, world.") == [
        ("Hello", ",", True), ("world", ".", False),
    ]
    assert P.split_clauses("a,b.") == [
        ("a", ",", False), ("b", ".", False),
    ]
    assert P.split_clauses("No punctuation") == [
        ("No punctuation", None, False),
    ]
    assert P.split_clauses("One; two: three?") == [
        ("One", ";", True), ("two", ":", True), ("three", "?", False),
    ]


class _FakeTextToPhonemes:
    """Mimics espeak_TextToPhonemes: reads the clause text from the
    char** and NULLs it (single-chunk), returning canned IPA bytes."""

    restype = None  # assigned by the backend

    def __init__(self, mapping):
        self.mapping = mapping

    def __call__(self, ptr, textmode, phonememode):
        assert textmode == 1 and phonememode == 0x02
        addr = ptr.contents.value
        if not addr:
            return b""
        text = ctypes.string_at(addr).decode("utf-8")
        ptr.contents.value = None
        return self.mapping[text].encode("utf-8")


class _FakeEspeak:
    def __init__(self, mapping):
        self.espeak_TextToPhonemes = _FakeTextToPhonemes(mapping)
        self.voice = None

    def espeak_Initialize(self, *a):
        return 22050

    def espeak_SetVoiceByName(self, name):
        self.voice = name
        return 0


def test_phonemize_espeak_with_fake_lib(monkeypatch):
    fake = _FakeEspeak({
        "Hello": "həlˈoʊ",
        "world": "wˈɜːld",
        "Bye": "bˈaɪ",
    })
    monkeypatch.setattr(P, "_ESPEAK_LIB", fake)
    monkeypatch.setattr(P, "_ESPEAK_INITIALIZED", False)
    out = P.phonemize_espeak("Hello, world. Bye!", voice="en-us")
    assert fake.voice == b"en-us"
    assert out == [
        list("həlˈoʊ") + [",", " "] + list("wˈɜːld") + ["."],
        list("bˈaɪ") + ["!"],
    ]
    assert P._ESPEAK_INITIALIZED  # init path exercised


def test_phonemize_espeak_unavailable():
    with pytest.raises(P.PhonemizerUnavailable):
        P._load_espeak()
