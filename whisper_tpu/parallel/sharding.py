"""Sharding spec table — the TPU analogue of the reference meta backend's
per-tensor split states (ggml/include/ggml-backend.h:360-407: axis shards,
MIRRORED, PARTIAL+allreduce).

Megatron-style TP over the 'tp' mesh axis:

  * attention q/k/v and MLP up projections: output (head/hidden) dim sharded
    -> column parallel; the per-head attention then runs fully local;
  * attention out and MLP down projections: input dim sharded -> row
    parallel; XLA inserts the psum where the reference's meta backend marks
    PARTIAL tensors and issues NCCL allreduce (ggml-backend-meta.cpp:2077);
  * LayerNorms, conv stem, positional embeddings: replicated (MIRRORED);
  * token embedding: replicated for now (logits allreduce-free); a
    vocab-sharded variant is a planned optimization;
  * KV caches and cross-KV: sharded over the head dim so cache updates and
    attention stay local to each shard;
  * the 'dp' axis shards independent audio windows (whisper_full_parallel's
    role, src/whisper.cpp:7811) — model params are replicated across 'dp'.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_specs(hp) -> Dict[str, Any]:
    """PartitionSpec pytree matching the load.py param pytree layout.
    Weight matrices are (in, out); leading axis is the stacked layer axis."""
    col = P(None, None, "tp")     # (L, in, out) -> shard out
    row = P(None, "tp", None)     # (L, in, out) -> shard in (partial sums)
    bias_sh = P(None, "tp")       # bias on a sharded output
    rep1 = P(None)
    rep2 = P(None, None)
    rep3 = P(None, None, None)

    enc_blocks = {
        "attn_ln_w": rep2, "attn_ln_b": rep2,
        # fused qkv (both stacks): COLUMN sharded.  Round 2 kept this row
        # parallel (out of concern that a plain column shard splits the
        # [q|k|v] concatenation across devices, breaking head locality),
        # which paid one extra (B, T, 3S) allreduce per layer — the cost
        # the reference's meta backend avoids with segmented fused-QKV
        # splits (ggml-backend.h:369-401).  The round-3 HLO audit
        # (tools/collective_audit.py) shows GSPMD handles the misaligned
        # column shard with the collective-permutes it was ALREADY issuing
        # for the head-sharded cache write: tp=4/S=1024 decode-step bytes
        # drop 1313 -> 640 KiB (qkv allreduce and all 9 allgathers gone),
        # and sharded==single numerics still hold (dryrun_multichip,
        # tests/test_multichip_numerics.py).
        "qkv_w": col, "qkv_b": bias_sh,
        "o_w": row, "o_b": rep2,
        "mlp_ln_w": rep2, "mlp_ln_b": rep2,
        "mlp0_w": col, "mlp0_b": bias_sh,
        "mlp1_w": row, "mlp1_b": rep2,
    }
    dec_blocks = dict(enc_blocks)
    dec_blocks.update({
        "xattn_ln_w": rep2, "xattn_ln_b": rep2,
        "xq_w": col, "xq_b": bias_sh,
        "xk_w": col,
        "xv_w": col, "xv_b": bias_sh,
        "xo_w": row, "xo_b": rep2,
    })
    return {
        "enc": {
            "pos_embd": rep2,
            "conv1_w": rep3, "conv1_b": rep1,
            "conv2_w": rep3, "conv2_b": rep1,
            "ln_post_w": rep1, "ln_post_b": rep1,
            "blocks": enc_blocks,
        },
        "dec": {
            "pos_embd": rep2,
            "tok_embd": rep2,
            "ln_w": rep1, "ln_b": rep1,
            "blocks": dec_blocks,
        },
    }


def cross_kv_spec() -> P:
    """(n_layer, n_head, n_audio_ctx, d_head): shard heads."""
    return P(None, "tp", None, None)


def kv_cache_spec() -> P:
    """(n_layer, n_beam, n_head, 2, n_text_ctx, d_head): shard HEADS.

    The head-major cache layout (model.KVCache) carries an explicit head
    axis, so 'tp' shards it directly (tp must divide n_head) — both the
    per-step cache write and the whole self-attention (scores, softmax,
    probs @ V) are device-local, matching the reference meta backend's
    by-head KV splits (ggml-backend.h:369-401).  The psum per layer happens
    after the row-sharded o_w projection, exactly where the reference marks
    PARTIAL."""
    return P(None, None, "tp", None, None, None)


def shard_params(params, mesh: Mesh, hp):
    """Place a param pytree onto the mesh with the TP spec table."""
    specs = param_specs(hp)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs)
