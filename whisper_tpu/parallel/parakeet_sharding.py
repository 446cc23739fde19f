"""Parakeet-TDT tensor-parallel sharding spec table.

Same Megatron-style recipe as the whisper table (parallel/sharding.py):
column-shard the projections that expand into heads/hidden, row-shard the
ones that contract back (XLA inserts the psum for the partial sums), and
replicate norms/biases/small tensors.

Conformer specifics:
  * attention q/k/v/pos: column (head dim); out: row;
  * pos_bias_u/v: (n_head, d_head) -> shard heads;
  * feed-forward linear1: column, linear2: row, at both FFN half-blocks;
  * the conv module's pointwise_conv1 doubles the channels for the GLU gate
    in ONE matrix (signal | gate concatenated along the output dim), so
    sharding its output would split signal and gate across different shards
    — pw1, the depthwise conv and batch-norm stay replicated and only pw2
    row-shards; a gate-aware split is a planned refinement;
  * prediction LSTM + joint run per stream (tiny matrices) -> replicated;
    the 'dp' axis shards independent utterances.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parakeet_param_specs() -> Dict[str, Any]:
    """PartitionSpec pytree matching models/parakeet/load.py's layout.
    Per-layer weights are (L, out, in) — the file orientation."""
    col = P(None, "tp", None)    # (L, out, in): shard out
    row = P(None, None, "tp")    # (L, out, in): shard in (partial sums)
    rep1, rep2, rep3 = P(None), P(None, None), P(None, None, None)

    layers = {
        "norm_ff1_w": rep2, "norm_ff1_b": rep2,
        "ff1_lin1_w": col, "ff1_lin2_w": row,
        "norm_conv_w": rep2, "norm_conv_b": rep2,
        "conv_pw1_w": rep3,          # GLU signal|gate packed: replicated
        "conv_dw_w": rep3,
        "conv_bn_w": rep2, "conv_bn_b": rep2,
        "conv_bn_mean": rep2, "conv_bn_var": rep2,
        "conv_pw2_w": rep3,
        "norm_attn_w": rep2, "norm_attn_b": rep2,
        "pos_bias_u": P(None, "tp", None),
        "pos_bias_v": P(None, "tp", None),
        "attn_q_w": col, "attn_k_w": col, "attn_v_w": col,
        "attn_pos_w": col,
        "attn_out_w": row,
        "norm_ff2_w": rep2, "norm_ff2_b": rep2,
        "ff2_lin1_w": col, "ff2_lin2_w": row,
        "norm_out_w": rep2, "norm_out_b": rep2,
    }
    pre = {
        "out_w": rep2, "out_b": rep1,
        **{f"conv{i}_w": P(None, None, None, None) for i in (0, 2, 3, 5, 6)},
        **{f"conv{i}_b": rep1 for i in (0, 2, 3, 5, 6)},
    }
    pred = {
        "embed_w": rep2,
        "lstm_ih_w": rep3, "lstm_hh_w": rep3, "lstm_b_h": rep2,
    }
    joint = {
        "pred_w": rep2, "pred_b": rep1,
        "enc_w": rep2, "enc_b": rep1,
        "net_w": rep2, "net_b": rep1,
    }
    return {"pre": pre, "layers": layers, "pred": pred, "joint": joint}


def shard_parakeet_params(params, mesh: Mesh):
    specs = parakeet_param_specs()
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs)
