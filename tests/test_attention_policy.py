"""Flash-attention routing policy (ops/attention.py).

The Pallas flash kernel computes in bf16, so it must only be selected when
the requested compute dtype is bf16: encode(dtype=float32) is the documented
bit-accuracy mode and must keep the exact XLA attention path."""

import jax.numpy as jnp

from whisper_tpu.ops.attention import use_flash


def test_use_flash_never_for_f32():
    assert not use_flash(1500, jnp.float32)
    assert not use_flash(1500, jnp.float16)


def test_use_flash_needs_long_seq():
    # (backend-dependent half: on TPU these return True, off-TPU False —
    # either way f32 and short sequences must say no)
    assert not use_flash(64, jnp.bfloat16)
