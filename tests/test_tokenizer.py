"""Tokenizer contract tests (cf. /root/reference/tests/test_tokenizer.py)."""

from whisper_tpu.tokenizer import get_tokenizer


def test_tokenizer():
    gpt2 = get_tokenizer(multilingual=False)
    multi = get_tokenizer(multilingual=True)
    assert gpt2.sot in gpt2.sot_sequence
    assert len(gpt2.all_language_codes) == len(gpt2.all_language_tokens)
    assert all(c < gpt2.timestamp_begin for c in gpt2.all_language_tokens)
    assert all(len(code) in {2, 3} for code in gpt2.all_language_codes)
    assert multi.sot in multi.sot_sequence


def test_multilingual_tokenizer():
    gpt2 = get_tokenizer(multilingual=False)
    multi = get_tokenizer(multilingual=True)

    text = "다람쥐 헌 쳇바퀴에 타고파"
    gpt2_tokens = gpt2.encode(text)
    multi_tokens = multi.encode(text)

    assert gpt2.decode(gpt2_tokens) == text
    assert multi.decode(multi_tokens) == text
    assert len(gpt2_tokens) > len(multi_tokens)


def test_split_on_unicode():
    multi = get_tokenizer(multilingual=True)

    tokens = [8404, 871, 287, 6, 246, 526, 3210, 20378]
    words, word_tokens = multi.split_tokens_on_unicode(tokens)

    assert words == [" elle", " est", " l", "'", "�", "é", "rit", "oire"]
    assert word_tokens == [[8404], [871], [287], [6], [246], [526], [3210], [20378]]


def test_special_token_space():
    multi = get_tokenizer(multilingual=True)
    assert multi.sot == 50258
    assert multi.eot == 50257
    assert multi.timestamp_begin == 50364
    assert multi.no_speech == 50362
    assert multi.no_timestamps == 50363
    assert multi.special_tokens["<|30.00|>"] == 50364 + 1500

    gpt2 = get_tokenizer(multilingual=False)
    assert gpt2.eot == 50256
    assert gpt2.sot == 50257
    assert gpt2.timestamp_begin == 50363


def test_sot_sequence_languages():
    t = get_tokenizer(multilingual=True, language="fr", task="translate")
    assert t.sot_sequence == (50258, 50258 + 1 + 6, t.translate)  # fr is index 6

    en = get_tokenizer(multilingual=True, language="English", task="transcribe")
    assert en.language == "en"
    assert en.sot_sequence == (50258, 50259, en.transcribe)


def test_word_split_on_spaces():
    t = get_tokenizer(multilingual=True, language="en", task="transcribe")
    tokens = t.encode(" And so, my fellow Americans!")
    words, word_tokens = t.split_to_word_tokens(tokens + [t.eot])
    assert "".join(words[:-1]) == " And so, my fellow Americans!"
    assert sum(word_tokens, []) == tokens + [t.eot]
    # punctuation is its own "word"
    assert "," in words
