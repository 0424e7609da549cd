"""Tokenizer-fallback guard: running pretrained weights with the
hash-bucket tokenizer must raise (round-1 verdict: a silent fallback would
produce garbage masks from a real checkpoint)."""

import pytest


def test_require_real_tokenizer_raises_without_bpe(monkeypatch):
    from tce_rvos_tpu.models import text_encoder

    monkeypatch.setattr(text_encoder, "_HF_TRIED", True)
    monkeypatch.setattr(text_encoder, "_HF_TOKENIZER", None)
    with pytest.raises(RuntimeError, match="RoBERTa BPE"):
        text_encoder.require_real_tokenizer("--resume checkpoint")


def test_require_real_tokenizer_passes_with_bpe(monkeypatch):
    from tce_rvos_tpu.models import text_encoder

    monkeypatch.setattr(text_encoder, "_HF_TRIED", True)
    monkeypatch.setattr(text_encoder, "_HF_TOKENIZER", object())
    text_encoder.require_real_tokenizer()  # no raise


def test_tokenize_fallback_is_deterministic():
    from tce_rvos_tpu.models.text_encoder import tokenize

    a1, m1 = tokenize(["the red ball"])
    a2, m2 = tokenize(["the red ball"])
    assert (a1 == a2).all() and (m1 == m2).all()
