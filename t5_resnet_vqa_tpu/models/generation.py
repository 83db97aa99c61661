"""Autoregressive answer generation for the ViT+T5 enc-dec model.

The reference declares generative decoding (num_beams/max_answer_length on
every model, NUM_BEAMS=3 in enums.py:52) but its ``generate_answers_beam`` is
a dead stub — the loop computes logits and never returns
(vit_vqa_model.py:294-341). This module is the working TPU-native
implementation: greedy and beam search over the T5 vocabulary using the tied
LM head, continuing the "[Question] {q} [Answer]" prompt the collate already
produces. Static shapes throughout: the decode buffer is
prompt_len + max_answer_length wide and every step is a full-sequence decoder
pass inside ``lax.fori_loop`` (sequences are <=25 tokens, so KV caching would
cost more in complexity than it saves).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import constants


def _extend(ids: jnp.ndarray, mask: jnp.ndarray, extra: int):
    pad = [(0, 0), (0, extra)]
    return jnp.pad(ids, pad), jnp.pad(mask, pad)


def greedy_generate(
    model,
    params,
    question_input_ids: jnp.ndarray,
    question_attention_masks: jnp.ndarray,
    decoder_question_input_ids: jnp.ndarray,
    decoder_question_attention_masks: jnp.ndarray,
    pixel_values: jnp.ndarray,
    max_answer_length: int = 5,
) -> jnp.ndarray:
    """-> [B, max_answer_length] generated token ids (0-padded after EOS)."""
    fused = model.apply(params, question_input_ids, question_attention_masks,
                        pixel_values, method="fuse")
    ids, mask = _extend(decoder_question_input_ids,
                        decoder_question_attention_masks, max_answer_length)
    B, L = ids.shape
    prompt_len = jnp.sum(decoder_question_attention_masks, axis=1)  # [B]
    eos = constants.EOS_TOKEN_ID

    def body(t, carry):
        ids, mask, done = carry
        logits = model.apply(params, ids, mask, fused,
                             method="decode_vocab_logits")   # [B, L, V]
        pos = prompt_len + t - 1                              # last live token
        step_logits = jnp.take_along_axis(
            logits, pos[:, None, None], axis=1)[:, 0, :]      # [B, V]
        nxt = jnp.argmax(step_logits, axis=-1).astype(ids.dtype)
        nxt = jnp.where(done, jnp.asarray(0, ids.dtype), nxt)
        write = pos + 1
        ids = ids.at[jnp.arange(B), write].set(nxt)
        mask = mask.at[jnp.arange(B), write].set(
            jnp.where(done, 0, 1).astype(mask.dtype))
        done = done | (nxt == eos)
        return ids, mask, done

    done0 = jnp.zeros((B,), bool)
    ids, mask, _ = jax.lax.fori_loop(0, max_answer_length, body,
                                     (ids, mask, done0))
    # slice out the generated region per batch row
    take = prompt_len[:, None] + jnp.arange(max_answer_length)[None, :]
    return jnp.take_along_axis(ids, take, axis=1)


def beam_generate(
    model,
    params,
    question_input_ids: jnp.ndarray,
    question_attention_masks: jnp.ndarray,
    decoder_question_input_ids: jnp.ndarray,
    decoder_question_attention_masks: jnp.ndarray,
    pixel_values: jnp.ndarray,
    max_answer_length: int = 5,
    num_beams: int = constants.NUM_BEAMS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam search; -> (tokens [B, max_answer_length], scores [B]).

    Beams ride an expanded batch dim (the reference's
    prepare_input_ids_for_generation expansion intent, :344-351); length-
    normalized sum-of-logprobs scoring; finished beams (EOS) freeze.
    """
    fused = model.apply(params, question_input_ids, question_attention_masks,
                        pixel_values, method="fuse")
    B, D = fused.shape
    K = num_beams
    eos = constants.EOS_TOKEN_ID

    ids, mask = _extend(decoder_question_input_ids,
                        decoder_question_attention_masks, max_answer_length)
    L = ids.shape[1]
    prompt_len = jnp.sum(decoder_question_attention_masks, axis=1)  # [B]

    # expand to beams: [B*K, ...]
    def exp(x):
        return jnp.repeat(x, K, axis=0)

    ids_k = exp(ids)
    mask_k = exp(mask)
    fused_k = exp(fused)
    plen_k = exp(prompt_len)
    # first expansion must diverge: only beam 0 is live initially
    scores = jnp.tile(jnp.asarray([0.0] + [-1e9] * (K - 1), jnp.float32),
                      (B, 1))                                  # [B, K]
    done = jnp.zeros((B, K), bool)

    def body(t, carry):
        ids_k, mask_k, scores, done = carry
        logits = model.apply(params, ids_k, mask_k, fused_k,
                             method="decode_vocab_logits")     # [B*K, L, V]
        V = logits.shape[-1]
        pos = plen_k + t - 1
        step = jnp.take_along_axis(logits, pos[:, None, None],
                                   axis=1)[:, 0, :]            # [B*K, V]
        logp = jax.nn.log_softmax(step, axis=-1).reshape(B, K, V)

        # finished beams contribute exactly one continuation (pad, score 0)
        pad_row = jnp.full((V,), -1e9).at[0].set(0.0)
        logp = jnp.where(done[:, :, None], pad_row[None, None, :], logp)

        total = scores[:, :, None] + logp                      # [B, K, V]
        flat = total.reshape(B, K * V)
        new_scores, flat_idx = jax.lax.top_k(flat, K)          # [B, K]
        parent = flat_idx // V                                 # [B, K]
        token = (flat_idx % V).astype(ids_k.dtype)

        # reorder beams by parent
        gather = (jnp.arange(B)[:, None] * K + parent).reshape(-1)
        ids_k = ids_k[gather]
        mask_k = mask_k[gather]
        done_p = done.reshape(-1)[gather].reshape(B, K)

        write = (plen_k + t).reshape(B, K)
        tok = jnp.where(done_p, jnp.zeros_like(token), token)
        ids_k = ids_k.at[jnp.arange(B * K), write.reshape(-1)].set(
            tok.reshape(-1))
        mask_k = mask_k.at[jnp.arange(B * K), write.reshape(-1)].set(
            jnp.where(done_p, 0, 1).reshape(-1).astype(mask_k.dtype))
        done = done_p | (tok == eos)
        return ids_k, mask_k, new_scores, done

    ids_k, mask_k, scores, done = jax.lax.fori_loop(
        0, max_answer_length, body, (ids_k, mask_k, scores, done))

    # pick best beam per batch (length-normalized)
    gen_len = jnp.maximum(
        jnp.sum(mask_k.reshape(B, K, L), axis=-1)
        - prompt_len[:, None], 1)
    norm = scores / gen_len.astype(scores.dtype)
    best = jnp.argmax(norm, axis=-1)                           # [B]
    sel = jnp.arange(B) * K + best
    ids_best = ids_k[sel]
    take = prompt_len[:, None] + jnp.arange(max_answer_length)[None, :]
    return (jnp.take_along_axis(ids_best, take, axis=1),
            jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0])
