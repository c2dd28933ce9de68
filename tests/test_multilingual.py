"""Multilingual text front end: the standard espeak phoneme-id map
must reproduce the shipped fixture ids across languages
(reference fixtures: etc/test_sentences/test_*.jsonl, 28 languages).

test_uk.jsonl is a text-phoneme (codepoint) voice with its own id map
and is validated separately. Fixture lines holding multiple sentences
carry embedded [EOS][BOS,PAD] boundaries and are skipped (a handful
per language)."""

import json
import unicodedata
from pathlib import Path

import pytest

from piper_tpu.text.phonemes import phonemes_to_ids
from piper_tpu.train.preprocess import default_espeak_id_map

FIXTURE_DIR = Path("/root/reference/etc/test_sentences")
TEXT_VOICE_FIXTURES = {"test_uk.jsonl"}
LANGS = sorted(
    p.name
    for p in FIXTURE_DIR.glob("test_*.jsonl")
    if p.name not in TEXT_VOICE_FIXTURES
)


@pytest.mark.parametrize("fixture", LANGS)
def test_fixture_ids_reproduced(fixture):
    id_map = default_espeak_id_map()
    n_checked = n_skipped = 0
    with open(FIXTURE_DIR / fixture, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if len(rec["phoneme_ids"]) != 2 * len(rec["phonemes"]) + 3:
                n_skipped += 1  # multi-sentence line
                continue
            ids = phonemes_to_ids(rec["phonemes"], id_map)
            assert ids == rec["phoneme_ids"], (fixture, rec["text"][:40])
            n_checked += 1
    assert n_checked > 0


def test_text_voice_fixture_is_codepoint_style():
    """test_uk ids come from a codepoint voice map (raw Cyrillic
    'phonemes'), not the shared espeak map."""
    rec = json.loads(
        (FIXTURE_DIR / "test_uk.jsonl").read_text().splitlines()[0]
    )
    assert any(
        "CYRILLIC" in unicodedata.name(p, "")
        for p in rec["phonemes"]
        if len(p) == 1
    )


def test_language_coverage():
    assert len(LANGS) >= 25
