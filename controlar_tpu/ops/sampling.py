"""Token sampling: temperature / top-k / top-p, fully jittable.

Reference semantics (ref: autoregressive/models/generate.py:17-74):
- logits /= max(temperature, 1e-5)
- top-k: keep the k highest logits, others -> -inf
- top-p: sort descending, keep tokens until cumulative softmax prob exceeds
  top_p (the first token crossing the threshold is kept), others -> -inf
- sample from softmax via multinomial (here: Gumbel trick via
  jax.random.categorical), or argmax when sample_logits=False.

RNG deviation (documented, SURVEY.md §7 "hard parts"): torch.multinomial and
jax.random.categorical draw from the *same distribution* but with different
random streams, so sampled sequences differ at equal seeds; greedy paths are
bit-comparable.

TPU notes: vocab is 16384 = 128 lanes x 128 sublanes — a single tile-friendly
row per sequence. top_k/top_p use jax.lax.top_k / sort which XLA lowers to
efficient on-chip sorts; everything lives inside the jitted decode step so no
host sync happens per token (the reference syncs every token, generate.py:71).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def top_k_top_p_filter(
    logits: jnp.ndarray, top_k: int = 0, top_p: float = 1.0
) -> jnp.ndarray:
    """Mask logits outside top-k / nucleus top-p to -inf. logits: (..., V).

    top_k is a static Python int (0 disables); top_p a static float.
    """
    if top_k > 0:
        k = min(max(top_k, 1), logits.shape[-1])
        # approx_max_k at recall_target=1.0 is EXACT but lowers to the TPU
        # PartialReduce op (~1.6x faster than lax.top_k at vocab 16384)
        kth = jax.lax.approx_max_k(logits, k, recall_target=1.0)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cdf = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # keep the first token that crosses the threshold (shift-right trick,
        # ref generate.py:45-51)
        remove = cdf > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        # threshold logit: smallest kept logit in sorted order
        kept = jnp.where(remove, NEG_INF, sorted_logits)
        min_keep = jnp.min(jnp.where(remove, jnp.inf, sorted_logits), axis=-1, keepdims=True)
        del kept
        logits = jnp.where(logits < min_keep, NEG_INF, logits)
    return logits


@partial(jax.jit, static_argnames=("temperature", "top_k", "top_p", "sample_logits"))
def sample_tokens(
    rng: jax.Array,
    logits: jnp.ndarray,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    sample_logits: bool = True,
) -> jnp.ndarray:
    """Sample next tokens from (B, V) logits -> (B,) int32."""
    logits = logits.astype(jnp.float32) / max(temperature, 1e-5)
    if top_k > 0 or top_p < 1.0:
        logits = top_k_top_p_filter(logits, top_k=top_k, top_p=top_p)
    if sample_logits:
        return jax.random.categorical(rng, logits, axis=-1)
    return jnp.argmax(logits, axis=-1)
