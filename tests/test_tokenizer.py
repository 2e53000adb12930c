"""Tokenizer / vocab / language-table tests."""

import pytest

from qwen2_audio_tpu.lang import lang_id, lang_max_id, lang_str, lang_str_full
from qwen2_audio_tpu.tokenizer import WhisperVocab


def test_lang_table():
    assert lang_max_id() == 99
    assert lang_id("en") == 0
    assert lang_id("german") == 2
    assert lang_id("de") == 2
    assert lang_id("yue") == 99
    assert lang_id("klingon") == -1
    assert lang_str(2) == "de"
    assert lang_str_full(2) == "german"
    assert lang_str(100) is None


@pytest.fixture
def tiny_vocab():
    toks = [b"a", b"b", b"ab", b"hello", b" world", b"he", b"llo", b" ", b"w"]
    return WhisperVocab.from_token_list(toks, n_vocab=51864)


def test_greedy_longest_match(tiny_vocab):
    # "hello world" -> regex split ["hello", " world"]; greedy picks the
    # longest vocab entries first
    ids = tiny_vocab.tokenize("hello world")
    assert [tiny_vocab.token_to_str(i) for i in ids] == ["hello", " world"]

    ids = tiny_vocab.tokenize("ab")
    assert [tiny_vocab.token_to_str(i) for i in ids] == ["ab"]

    # unknown bytes are skipped, not crashed on
    assert tiny_vocab.tokenize("zzz") == []


def test_special_token_synthesis_monolingual(tiny_vocab):
    v = tiny_vocab
    assert not v.is_multilingual
    assert v.token_eot == 50256
    assert v.token_sot == 50257
    assert v.token_beg == 50363
    assert v.id_to_token[50256] == b"[_EOT_]"
    assert v.id_to_token[50363] == b"[_BEG_]"
    assert v.id_to_token[51863].startswith(b"[_TT_")


def test_special_token_shift_multilingual():
    toks = [b"x"]
    v = WhisperVocab.from_token_list(toks, n_vocab=51865)
    assert v.is_multilingual
    assert v.num_languages == 99
    assert v.token_eot == 50257
    assert v.token_sot == 50258
    # dt = 99 - 98 = 1
    assert v.token_transcribe == 50359
    assert v.token_beg == 50364
    assert v.id_to_token[v.token_sot + 1] == b"[_LANG_en]"
    # 99 languages -> last language token is id 98 ("su"); "yue" needs v3
    assert v.id_to_token[v.token_sot + 99] == b"[_LANG_su]"
    assert v.token_lang(0) == v.token_sot + 1


def test_large_v3_vocab():
    v = WhisperVocab.from_token_list([b"x"], n_vocab=51866)
    assert v.num_languages == 100
    # dt = 2
    assert v.token_transcribe == 50360
    assert v.token_beg == 50365
