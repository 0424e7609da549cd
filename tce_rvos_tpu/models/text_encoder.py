"""RoBERTa-base text encoder, implemented natively in flax.

The reference instantiates HuggingFace ``RobertaModel`` + fast tokenizer at
build time (models/tce_rvos.py:136-137). We implement the same architecture
from scratch (12 layers, 768 hidden, post-norm, learned positions with the
RoBERTa padding-offset quirk, tanh pooler) so that:
  * no network access is required to build the model;
  * HF PyTorch ``roberta-base`` checkpoints load via the converter
    (utils/checkpoint.py);
  * the whole text path jits into the same XLA program as the vision path.

Tokenization is a host-side op and is pluggable: the real BPE tokenizer is
used when available locally (``transformers``), otherwise a deterministic
hash fallback keeps tests/benches runnable (flagged, NOT checkpoint
compatible).
"""

from __future__ import annotations

import zlib
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

PAD_TOKEN_ID = 1
BOS_TOKEN_ID = 0
EOS_TOKEN_ID = 2


class RobertaSelfAttention(nn.Module):
    hidden: int = 768
    heads: int = 12
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, attn_mask, deterministic=True):
        h, hd = self.heads, self.hidden // self.heads
        b, s, _ = x.shape
        q = nn.Dense(self.hidden, name="query")(x).reshape(b, s, h, hd)
        k = nn.Dense(self.hidden, name="key")(x).reshape(b, s, h, hd)
        v = nn.Dense(self.hidden, name="value")(x).reshape(b, s, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(attn_mask[:, None, None, :] == 0, neg, logits)
        probs = nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, self.hidden)
        return out


class RobertaLayer(nn.Module):
    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072
    dropout: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, attn_mask, deterministic=True):
        a = RobertaSelfAttention(self.hidden, self.heads, self.dropout, name="attention_self")(
            x, attn_mask, deterministic
        )
        a = nn.Dense(self.hidden, name="attention_output_dense")(a)
        a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.eps, name="attention_output_norm")(x + a)
        y = nn.Dense(self.intermediate, name="intermediate_dense")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden, name="output_dense")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.eps, name="output_norm")(x + y)


class RobertaModel(nn.Module):
    """Returns (last_hidden_state [B,S,768], pooler_output [B,768])."""

    vocab_size: int = 50265
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 514
    type_vocab: int = 1
    dropout: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # RoBERTa position ids: pad stays at padding_idx, real tokens count
        # from padding_idx+1 (transformers create_position_ids_from_input_ids)
        mask = attention_mask.astype(jnp.int32)
        position_ids = jnp.cumsum(mask, axis=1) * mask + PAD_TOKEN_ID

        we = nn.Embed(self.vocab_size, self.hidden, name="word_embeddings")(input_ids)
        pe = nn.Embed(self.max_positions, self.hidden, name="position_embeddings")(
            position_ids
        )
        te = nn.Embed(self.type_vocab, self.hidden, name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        x = nn.LayerNorm(epsilon=self.eps, name="embeddings_norm")(we + pe + te)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        for i in range(self.layers):
            x = RobertaLayer(
                self.hidden, self.heads, self.intermediate, self.dropout, self.eps,
                name=f"layer_{i}",
            )(x, attention_mask, deterministic)

        pooled = nn.tanh(nn.Dense(self.hidden, name="pooler_dense")(x[:, 0]))
        return x, pooled


_HF_TOKENIZER = None
_HF_TRIED = False


def _try_hf_tokenizer(name: str = "roberta-base"):
    global _HF_TOKENIZER, _HF_TRIED
    if _HF_TRIED:
        return _HF_TOKENIZER
    _HF_TRIED = True
    try:
        from transformers import RobertaTokenizerFast

        try:
            # local cache first — the network path retries with exponential
            # backoff for minutes on an air-gapped host (measured 215 s)
            _HF_TOKENIZER = RobertaTokenizerFast.from_pretrained(
                name, local_files_only=True
            )
        except Exception:
            import os

            if os.environ.get("HF_HUB_OFFLINE") or os.environ.get(
                "TRANSFORMERS_OFFLINE"
            ):
                raise
            _HF_TOKENIZER = RobertaTokenizerFast.from_pretrained(name)
    except Exception:
        _HF_TOKENIZER = None
    return _HF_TOKENIZER


def require_real_tokenizer(context: str = "pretrained weights") -> None:
    """Refuse to run with the hash-bucket fallback when real checkpoint
    weights are in play: the fallback's token ids are NOT RoBERTa BPE ids,
    so a pretrained text encoder would silently produce garbage embeddings
    (and garbage masks). Raise loudly instead."""
    if _try_hf_tokenizer() is None:
        raise RuntimeError(
            f"Loading {context} requires the real RoBERTa BPE tokenizer, but "
            "only the hash-bucket fallback is available (transformers missing "
            "or 'roberta-base' tokenizer files not downloadable/cached). "
            "Install/cache the tokenizer before running with real weights."
        )


def tokenize(
    captions: list[str], max_len: Optional[int] = None, pad_to_multiple: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side tokenization -> (input_ids, attention_mask) int32 arrays,
    padded to a multiple of ``pad_to_multiple`` (static-shape friendly).

    Uses the real RoBERTa BPE when available; otherwise a deterministic
    hash-bucket fallback (adequate for random-weights tests and benches,
    NOT for running pretrained checkpoints).
    """
    tok = _try_hf_tokenizer()
    if tok is not None:
        enc = tok.batch_encode_plus(captions, padding="longest")
        ids = [list(x) for x in enc["input_ids"]]
        msk = [list(x) for x in enc["attention_mask"]]
    else:
        ids, msk = [], []
        for cap in captions:
            words = cap.lower().split()
            # zlib.crc32, NOT hash(): builtin str hashing is salted per
            # process (PYTHONHASHSEED), which would break cross-process
            # determinism of cached/golden outputs
            wid = [BOS_TOKEN_ID] + [
                3 + (zlib.crc32(w.encode("utf-8")) % 50000) for w in words
            ] + [EOS_TOKEN_ID]
            ids.append(wid)
            msk.append([1] * len(wid))
    longest = max(len(x) for x in ids)
    if max_len is None:
        max_len = -(-longest // pad_to_multiple) * pad_to_multiple
    ids_arr = np.full((len(ids), max_len), PAD_TOKEN_ID, dtype=np.int32)
    msk_arr = np.zeros((len(ids), max_len), dtype=np.int32)
    for i, (seq, mseq) in enumerate(zip(ids, msk)):
        seq = seq[:max_len]
        ids_arr[i, : len(seq)] = seq
        msk_arr[i, : len(seq)] = mseq[: len(seq)]
    return ids_arr, msk_arr
