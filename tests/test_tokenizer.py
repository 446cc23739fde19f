"""Tokenizer / vocab semantics tests."""

import pytest

from whisper_tpu.decoding.languages import lang_id, lang_str, LANGUAGES


def test_lang_table():
    assert lang_id("en") == 0
    assert lang_id("english") == 0
    assert lang_id("yue") == 99
    assert lang_id("nope") == -1
    assert lang_str(3) == "es"
    assert len(LANGUAGES) == 100


def test_special_tokens_en(mini_model):
    v = mini_model.vocab
    assert not v.is_multilingual
    assert v.token_eot == 50256
    assert v.token_sot == 50257
    assert v.token_beg == 50363
    assert v.token_not == 50362


def test_special_tokens_multilingual():
    from whisper_tpu.models.whisper.load import load_model

    m = load_model("/root/reference/models/for-tests-ggml-tiny.bin")
    v = m.vocab
    assert v.is_multilingual
    assert v.token_eot == 50257
    assert v.token_sot == 50258
    # 99 languages in the original multilingual vocab (51865)
    assert v.num_languages == 99
    assert v.token_beg == 50364


def test_tokenize_roundtrip(mini_model):
    v = mini_model.vocab
    for text in [" And so my fellow Americans", " Hello, world!", " test 123"]:
        ids = v.tokenize(text)
        assert ids, text
        assert v.detokenize(ids) == text


def test_timestamp_token(mini_model):
    v = mini_model.vocab
    assert v.is_timestamp(v.token_beg)
    assert not v.is_timestamp(v.token_eot)
